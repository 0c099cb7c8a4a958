"""Rotary position embeddings, matching HF LLaMA semantics exactly.

HF layout: inv_freq over even indices, angles tiled as cat(freqs, freqs),
rotate_half(x) = cat(-x[..., d/2:], x[..., :d/2]). Weight import from the
reference checkpoints requires this exact convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, head_dim: int,
                theta: float = 10000.0):
    """cos/sin tables for integer `positions` (any shape), float32.

    Returns (cos, sin) of shape positions.shape + (head_dim,).
    """
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., d/2]
    angles = jnp.concatenate([angles, angles], axis=-1)           # [..., d]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding.

    x:   [..., seq, heads, head_dim]  (or any shape whose -3 dim is seq)
    cos/sin: [seq, head_dim] or broadcastable to x after inserting the
    heads axis.
    """
    if cos.ndim == 2:  # [seq, dim] -> [seq, 1, dim] to broadcast over heads
        cos = cos[:, None, :]
        sin = sin[:, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
