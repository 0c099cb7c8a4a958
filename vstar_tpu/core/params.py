"""Parameter-pytree utilities and dtype policy.

Modules in this framework are pure functions over nested-dict parameter
pytrees (``params['layers_3']['attn']['wq'] -> jnp.ndarray``). This keeps
weight import (HF torch state_dicts are flat name->tensor maps), sharding
(PartitionSpec trees mirror the param tree), and functional transforms
trivial, and avoids framework lock-in.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Numerics policy: storage vs compute vs reduction dtypes.

    TPU MXU wants bf16 inputs with f32 accumulation; norms/softmax stay f32.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    reduce_dtype: Any = jnp.float32


DEFAULT_POLICY = DTypePolicy()
BF16_POLICY = DTypePolicy(param_dtype=jnp.bfloat16)


def cast_tree(tree: Params, dtype) -> Params:
    """Cast all floating-point leaves of a pytree to `dtype`."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def flatten_params(tree: Params, prefix: str = "") -> Iterator[Tuple[str, Any]]:
    """Yield (dotted_path, leaf) pairs in deterministic order."""
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            yield from flatten_params(tree[k], f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from flatten_params(v, f"{prefix}{i}.")
    else:
        yield prefix.rstrip("."), tree


def param_count(tree: Params) -> int:
    return sum(int(np.prod(x.shape)) for _, x in flatten_params(tree)
               if hasattr(x, "shape"))


def param_bytes(tree: Params) -> int:
    return sum(x.size * x.dtype.itemsize for _, x in flatten_params(tree)
               if hasattr(x, "size"))


# ---------------------------------------------------------------------------
# Initializers (used for from-scratch init; weight import overwrites these)
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32,
               scale: float | None = None) -> jnp.ndarray:
    """Kaiming-uniform init matching torch.nn.Linear defaults.

    Weights are stored as (in_dim, out_dim) — the JAX `x @ w` layout, the
    transpose of torch's (out, in).
    """
    bound = scale if scale is not None else 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype=dtype,
                              minval=-bound, maxval=bound)


def bias_init(in_dim: int, out_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    del in_dim
    return jnp.zeros((out_dim,), dtype=dtype)


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32,
               scale: float = 0.02) -> jnp.ndarray:
    return (jax.random.normal(key, (vocab, dim), dtype=jnp.float32)
            * scale).astype(dtype)


class KeyGen:
    """Splits a PRNG key on demand: `kg = KeyGen(key); kg()` -> fresh key."""

    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


def map_with_path(fn: Callable[[str, Any], Any], tree: Params,
                  prefix: str = "") -> Params:
    """tree_map that passes the dotted path to `fn` (for partition rules).
    Recurses into dicts and lists/tuples (param trees contain both)."""
    if isinstance(tree, dict):
        return {k: map_with_path(fn, v, f"{prefix}{k}.")
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        mapped = [map_with_path(fn, v, f"{prefix}{i}.")
                  for i, v in enumerate(tree)]
        return type(tree)(mapped) if isinstance(tree, tuple) else mapped
    return fn(prefix.rstrip("."), tree)
