"""Device mesh and sharding utilities.

The reference scales with data parallelism + ZeRO-2 over NCCL
(/root/reference/VisualSearch/train.py:310-331, LLaVA/scripts/zero2.json).
The TPU-native equivalent: a `jax.sharding.Mesh` with named axes and
PartitionSpec trees; XLA inserts the ICI collectives.

Axes:
  * "data"  — batch/data parallelism (≈ DP ranks)
  * "model" — tensor parallelism over attention heads / MLP hidden
  * "fsdp"  — parameter/optimizer-state sharding (≈ ZeRO-3 / FSDP)

A 1-D ("data",) mesh with fsdp-sharded optimizer state reproduces ZeRO-2
semantics; adding "model" gives TP the reference never had.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .params import map_with_path, Params

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, FSDP_AXIS, MODEL_AXIS),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the "data"/"fsdp" product with model=1; callers
    pass `shape` to carve out TP. shape must multiply to len(devices).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1, 1)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


# ---------------------------------------------------------------------------
# Partition rules: dotted-param-path regex -> PartitionSpec
# ---------------------------------------------------------------------------

# Rules for the LLaMA decoder (the dominant parameter mass). Layout notes:
# all dense weights are stored (in_dim, out_dim); LLaMA layer weights are
# STACKED with a leading layer axis [L, in, out] (for lax.scan), so their
# specs have rank 3 — fsdp shards the layer stack (the classic
# gather-one-layer-per-scan-step FSDP pattern), model shards within.
LLAMA_RULES: Tuple[Tuple[str, P], ...] = (
    # vocab (32003) divides nothing; shard the hidden dim over fsdp.
    (r".*embed_tokens$", P(MODEL_AXIS, FSDP_AXIS)),
    (r".*lm_head$", P(FSDP_AXIS, MODEL_AXIS)),
    # attention: q/k/v project hidden->heads*dim; shard heads (out) on model
    (r".*\b(wq|wk|wv)$", P(FSDP_AXIS, None, MODEL_AXIS)),
    (r".*\bwo$", P(FSDP_AXIS, MODEL_AXIS, None)),
    # MLP: gate/up shard hidden_out over model, down shards hidden_in
    (r".*\b(w_gate|w_up)$", P(FSDP_AXIS, None, MODEL_AXIS)),
    (r".*\bw_down$", P(FSDP_AXIS, MODEL_AXIS, None)),
    # stacked per-layer norm scales [L, D]: shard the layer stack
    (r".*layers\..*(norm|ln)[^.]*\.(scale|bias)$", P(FSDP_AXIS)),
    (r".*(norm|ln)([^.]*|[^.]*\.(scale|bias))$", P()),
)

# Vision towers: stacked [L, in, out] weights — fsdp on the layer stack,
# model inside the MLP; everything else falls through to the default.
VISION_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*\bfc1\.w$", P(FSDP_AXIS, None, MODEL_AXIS)),
    (r".*\bfc2\.w$", P(FSDP_AXIS, MODEL_AXIS, None)),
    (r".*\b(wq|wk|wv|wo)\.w$", P(FSDP_AXIS, None, MODEL_AXIS)),
)

DEFAULT_RULES = LLAMA_RULES + VISION_RULES

# ZeRO-3-style default: shard the leading dim over fsdp whenever it
# divides (clipping drops it otherwise) — nothing big stays replicated.
_FALLBACK = P(FSDP_AXIS)


def spec_for(path: str, rules=DEFAULT_RULES) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return _FALLBACK


def partition_specs(params: Params, rules=DEFAULT_RULES) -> Params:
    """PartitionSpec tree mirroring `params`, clipped to each leaf's rank."""
    def _spec(path, leaf):
        spec = spec_for(path, rules)
        ndim = getattr(leaf, "ndim", 0)
        clipped = tuple(spec)[:ndim]
        # Pad with None so the spec rank never exceeds the leaf rank.
        return P(*clipped)
    return map_with_path(_spec, params)


def _clip_spec_to_leaf(spec: P, leaf, mesh: Mesh) -> P:
    """Drop sharding on axes that don't divide the mesh axis size (keeps
    tiny test configs valid on 8-way meshes) and clip to the leaf's rank."""
    shape = getattr(leaf, "shape", ())
    fixed = []
    for i, ax in enumerate(tuple(spec)[: len(shape)]):
        if ax is None:
            fixed.append(None)
        else:
            fixed.append(ax if shape[i] % mesh.shape[ax] == 0 else None)
    return P(*fixed)


def shard_params(params: Params, mesh: Mesh, rules=DEFAULT_RULES) -> Params:
    """Device-put `params` onto `mesh` according to the partition rules."""
    def _put(path, leaf):
        spec = _clip_spec_to_leaf(spec_for(path, rules), leaf, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return map_with_path(_put, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def global_batch(batch, mesh: Mesh):
    """Host batch (numpy/array leaves, leading dim = this process's rows)
    -> global device arrays sharded over the data axis.

    Single process: equivalent to device_put with the data sharding.
    Multi-process (pod): every host contributes its local rows to the
    global batch (jax.make_array_from_process_local_data) — the TPU-native
    replacement for the reference's per-rank DataLoader + DeepSpeed
    scatter (VisualSearch/train.py:319-331)."""
    import numpy as np

    ndata = mesh.shape[DATA_AXIS]
    nproc = jax.process_count()
    if nproc > 1 and ndata < nproc:
        # each process contributes DIFFERENT rows; a batch dim replicated
        # (or sharded over fewer ways than there are processes) would make
        # JAX assume identical per-host buffers and silently diverge
        raise ValueError(
            f"multi-host run needs the data mesh axis >= process count "
            f"({ndata} < {nproc}); pass --mesh with data >= {nproc}")
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        if (arr.shape[0] * jax.process_count()) % ndata == 0:
            out[k] = jax.make_array_from_process_local_data(
                data_sharding(mesh, arr.ndim), arr)
        elif jax.process_count() == 1:
            # batch smaller than the data axis (tiny tests/debug runs):
            # replicate and let sharding propagation decide, like a bare
            # device transfer would
            out[k] = jax.device_put(arr, NamedSharding(mesh, P()))
        else:
            raise ValueError(
                f"batch dim {arr.shape[0]} x {jax.process_count()} "
                f"processes not divisible by data axis {ndata} ({k})")
    return out
