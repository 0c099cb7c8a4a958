"""Per-chip HBM accounting for sharded training (the "7B memory plan").

The reference trains 7B with DeepSpeed ZeRO-2 over 8 GPUs
(VisualSearch/train.py:310-331, LLaVA/scripts/zero2.json); the TPU-native
equivalent is parameter/optimizer sharding over the mesh's fsdp axis with
bf16 parameter storage and f32 master weights in the optimizer
(train/master.py). This module computes what actually lands on each chip
for a given (params, mesh, rules) so the trainers can PRINT the plan and
refuse configurations that cannot fit (r1 shipped a default that would
replicate 7B f32 + AdamW on 16 GB v5e chips).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np

from .mesh import DEFAULT_RULES, _clip_spec_to_leaf, spec_for
from .params import map_with_path

V5E_HBM_GB = 16.0


@dataclass
class MemoryPlan:
    params_bytes: int          # parameter storage per chip
    master_bytes: int          # f32 master copies (trainable leaves)
    moments_bytes: int         # AdamW mu+nu (f32, trainable leaves)
    grads_bytes: int           # one gradient tree (compute dtype)
    n_params: int              # total parameter count (unsharded)

    @property
    def total_bytes(self) -> int:
        return (self.params_bytes + self.master_bytes + self.moments_bytes
                + self.grads_bytes)

    def summary(self) -> str:
        gb = 1024 ** 3
        return (f"params {self.params_bytes / gb:.2f} GB/chip, "
                f"masters {self.master_bytes / gb:.2f}, "
                f"moments {self.moments_bytes / gb:.2f}, "
                f"grads {self.grads_bytes / gb:.2f} "
                f"=> {self.total_bytes / gb:.2f} GB/chip "
                f"({self.n_params / 1e9:.2f}B params)")


def _shard_factor(spec, leaf_shape, mesh) -> int:
    f = 1
    for i, ax in enumerate(tuple(spec)[: len(leaf_shape)]):
        if ax is not None:
            f *= mesh.shape[ax]
    return f


def plan_train_memory(params, mesh, trainable_mask: Optional[Dict] = None,
                      rules=DEFAULT_RULES,
                      master_f32: bool = True) -> MemoryPlan:
    """Account parameter + optimizer + gradient HBM per chip under the
    partition rules actually used by shard_params. `params` may be real
    arrays or ShapeDtypeStructs."""
    leaves_masked = []

    def _visit(path, leaf):
        spec = _clip_spec_to_leaf(spec_for(path, rules), leaf, mesh)
        leaves_masked.append((path, leaf, spec))
        return leaf

    map_with_path(_visit, params)
    mask_flat = {}
    if trainable_mask is not None:
        map_with_path(lambda p, m: mask_flat.__setitem__(p, bool(m)),
                      trainable_mask)

    p_bytes = m_bytes = mom_bytes = g_bytes = 0
    n_params = 0
    for path, leaf, spec in leaves_masked:
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 1
        itemsize = np.dtype(leaf.dtype).itemsize
        factor = _shard_factor(spec, shape, mesh)
        n_params += size
        p_bytes += size * itemsize // factor
        trainable = mask_flat.get(path, True)
        if trainable:
            if master_f32 and itemsize < 4:
                m_bytes += size * 4 // factor
            mom_bytes += 2 * size * 4 // factor
            g_bytes += size * itemsize // factor  # grads in param dtype
    return MemoryPlan(p_bytes, m_bytes, mom_bytes, g_bytes, n_params)


def check_memory(plan: MemoryPlan, hbm_gb: float = V5E_HBM_GB,
                 headroom: float = 0.75, what: str = "training") -> None:
    """Print the plan; raise if the static footprint exceeds `headroom` of
    HBM (the rest is activations/workspace)."""
    budget = hbm_gb * headroom * 1024 ** 3
    print(f"[memory] {what}: {plan.summary()} "
          f"(budget {budget / 1024**3:.1f} GB/chip)", flush=True)
    if plan.total_bytes > budget:
        raise MemoryError(
            f"{what} needs {plan.total_bytes / 1024**3:.2f} GB/chip of "
            f"static state but the budget is {budget / 1024**3:.1f} GB "
            f"({headroom:.0%} of {hbm_gb} GB HBM). Increase the fsdp mesh "
            f"axis (--mesh DxFxM), use --param_dtype bf16, or train fewer "
            f"parameters (LoRA).")


def parse_mesh_arg(mesh_arg: Optional[str], n_devices: int,
                   default_fsdp: bool = True):
    """'DxFxM' -> mesh shape tuple; None -> heuristic default.

    Heuristic: with more than one device put every device on the fsdp
    axis (ZeRO-3-style parameter sharding) — 7B does not fit replicated
    on 16 GB chips, and fsdp=all is also correct (just slightly chattier)
    for small models."""
    if mesh_arg:
        parts = tuple(int(x) for x in mesh_arg.lower().split("x"))
        assert len(parts) == 3, "--mesh must be DxFxM, e.g. 2x4x1"
        assert int(np.prod(parts)) == n_devices, (
            f"--mesh {mesh_arg} needs {np.prod(parts)} devices, "
            f"have {n_devices}")
        return parts
    if n_devices > 1 and default_fsdp:
        return (1, n_devices, 1)
    return (n_devices, 1, 1)
