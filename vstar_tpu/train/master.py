"""f32 master weights for bf16 parameter storage (ZeRO-2-style mixed
precision, the TPU equivalent of DeepSpeed's bf16+fp32-optimizer mode the
reference uses: VisualSearch/train.py:282-318 `bf16 {enabled: true}`).

Wraps any optax transformation: the inner optimizer sees f32 master
copies of every sub-f32 parameter (kept in the optimizer state, sharded
like the parameter), gradients are cast to f32 before the update, and the
emitted updates move the *stored* parameter to cast(new_master) — so the
authoritative accumulation happens in f32 and bf16 storage is just a
rounded view."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class MasterState(NamedTuple):
    master: optax.Params     # f32 copies for sub-f32 leaves, None otherwise
    inner: optax.OptState


def _needs_master(p) -> bool:
    return (hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
            and jnp.dtype(p.dtype).itemsize < 4)


def with_f32_master(inner: optax.GradientTransformation
                    ) -> optax.GradientTransformation:
    def init(params):
        master = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32) if _needs_master(p) else p,
            params)
        return MasterState(master=master, inner=inner.init(master))

    def update(grads, state, params=None):
        g32 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32)
            if hasattr(g, "dtype") and jnp.issubdtype(g.dtype, jnp.floating)
            else g, grads)
        updates, new_inner = inner.update(g32, state.inner, state.master)
        new_master = optax.apply_updates(state.master, updates)
        # emitted update = cast(new_master) - stored_param, in storage dtype
        out = jax.tree_util.tree_map(
            lambda m, p: (m.astype(p.dtype) - p) if _needs_master(p)
            else (m - p).astype(p.dtype),
            new_master, params)
        return out, MasterState(master=new_master, inner=new_inner)

    return optax.GradientTransformation(init, update)
