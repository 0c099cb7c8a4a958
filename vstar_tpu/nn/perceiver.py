"""Flamingo-style perceiver resampler — the "short" (32-token) projector.

Architecturally equivalent to the reference object projector
(LLaVA/llava/model/multimodal_projector/perceiver.py:25-122 wrapped by
builder.py:54-68 as Sequential(LayerNorm, PerceiverResampler, Linear)):
32 learned latents cross-attend to the 256 CLIP patch tokens (keys/values
are the concat of media and latents), 6 layers, then LayerNorm and a
linear 1024->4096 lift into the LM embedding space.

Single-image case only (num_media_embeds=1), so media is [B, N, D].
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import PerceiverConfig
from ..core.params import KeyGen, dense_init
from .basic import dense, init_dense, init_layernorm, layernorm


def init_perceiver_params(key, cfg: PerceiverConfig, out_dim: int,
                          dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    D = cfg.dim
    inner = cfg.dim_head * cfg.heads
    ff_inner = D * cfg.ff_mult

    def one_layer(k):
        kg2 = KeyGen(k)
        return {
            "norm_media": init_layernorm(D, dtype),
            "norm_latents": init_layernorm(D, dtype),
            "to_q": {"w": dense_init(kg2(), D, inner, dtype=dtype)},
            "to_kv": {"w": dense_init(kg2(), D, 2 * inner, dtype=dtype)},
            "to_out": {"w": dense_init(kg2(), inner, D, dtype=dtype)},
            "ff_norm": init_layernorm(D, dtype),
            "ff_in": {"w": dense_init(kg2(), D, ff_inner, dtype=dtype)},
            "ff_out": {"w": dense_init(kg2(), ff_inner, D, dtype=dtype)},
        }

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[one_layer(kg()) for _ in range(cfg.depth)])

    return {
        "pre_ln": init_layernorm(D, dtype),
        "latents": jax.random.normal(kg(), (cfg.num_latents, D)).astype(dtype),
        "media_pos_emb": jax.random.normal(
            kg(), (cfg.num_media_embeds, 1, D)).astype(dtype),
        "layers": layers,
        "final_norm": init_layernorm(D, dtype),
        "out_proj": init_dense(kg(), D, out_dim, True, dtype),
    }


def _perceiver_attention(lp: Dict, cfg: PerceiverConfig, media: jnp.ndarray,
                         latents: jnp.ndarray) -> jnp.ndarray:
    x = layernorm(lp["norm_media"], media)
    lat = layernorm(lp["norm_latents"], latents)
    B, N, D = x.shape
    L = lat.shape[1]
    H, Dh = cfg.heads, cfg.dim_head

    q = dense(lp["to_q"], lat).reshape(B, L, H, Dh)
    kv_in = jnp.concatenate([x, lat], axis=1)          # keys include latents
    kv = dense(lp["to_kv"], kv_in)
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(B, N + L, H, Dh)
    v = v.reshape(B, N + L, H, Dh)

    logits = jnp.einsum("bqhd,bkhd->bhqk",
                        q.astype(jnp.float32) * Dh ** -0.5,
                        k.astype(jnp.float32))
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True))
    probs = jax.nn.softmax(logits, axis=-1).astype(media.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, H * Dh)
    return dense(lp["to_out"], out)


def perceiver_resample(params: Dict, cfg: PerceiverConfig,
                       media: jnp.ndarray) -> jnp.ndarray:
    """media: [B, N, dim] vision features -> [B, num_latents, out_dim]."""
    x = layernorm(params["pre_ln"], media)
    x = x + params["media_pos_emb"][0].astype(x.dtype)[None]
    latents = jnp.broadcast_to(
        params["latents"].astype(x.dtype)[None],
        (x.shape[0], cfg.num_latents, cfg.dim))

    def layer(lat, lp):
        lat = lat + _perceiver_attention(lp, cfg, x, lat)
        h = layernorm(lp["ff_norm"], lat)
        h = dense(lp["ff_out"],
                  jax.nn.gelu(dense(lp["ff_in"], h), approximate=False))
        return lat + h, None

    latents, _ = jax.lax.scan(layer, latents, params["layers"])
    latents = layernorm(params["final_norm"], latents)
    return dense(params["out_proj"], latents)
