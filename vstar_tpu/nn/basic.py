"""Elementary neural-net building blocks (pure functions over param dicts).

Conventions:
  * Dense weights stored (in_dim, out_dim): `y = x @ w + b`.
  * Norms compute in float32 and cast back to the input dtype.
  * `init_*` return param dicts; `*` apply them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.params import KeyGen, bias_init, dense_init


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def quick_gelu(x):
    """CLIP/OWL-ViT activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "gelu": jax.nn.gelu,
    # torch.nn.GELU default is the exact (erf) formulation.
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True,
               dtype=jnp.float32):
    p = {"w": dense_init(key, in_dim, out_dim, dtype=dtype)}
    if use_bias:
        p["b"] = bias_init(in_dim, out_dim, dtype=dtype)
    return p


def dense(p, x):
    if "q" in p:            # weight-only int8 entry (nn/quant.py)
        from .quant import qdot
        y = qdot(x, p)
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_mlp(key, dims, use_bias: bool = True, dtype=jnp.float32):
    """Stack of dense layers: dims = [in, h1, ..., out]."""
    kg = KeyGen(key)
    return {f"fc{i}": init_dense(kg(), dims[i], dims[i + 1], use_bias, dtype)
            for i in range(len(dims) - 1)}


def mlp(p, x, act=jax.nn.relu, final_act: bool = False):
    n = len(p)
    for i in range(n):
        x = dense(p[f"fc{i}"], x)
        if i < n - 1 or final_act:
            x = act(x)
    return x


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def init_layernorm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_rmsnorm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rmsnorm(p, x, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    # Match HF LlamaRMSNorm: normalize in f32, cast to weight dtype, then scale.
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def init_embedding(key, vocab: int, dim: int, dtype=jnp.float32):
    from ..core.params import embed_init
    return {"embedding": embed_init(key, vocab, dim, dtype=dtype)}


def embedding_lookup(p, ids, dtype=None):
    emb = p["embedding"]
    out = jnp.take(emb, ids, axis=0)
    return out.astype(dtype) if dtype is not None else out
