"""Vision->LM projectors: linear / mlpNx_gelu / perceiver.

Mirrors the reference projector builder
(LLaVA/llava/model/multimodal_projector/builder.py:33-70): 'linear' keeps
one output token per input patch (256 "long" tokens), 'perceiver' resamples
to 32 latents ("short" tokens).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import ProjectorConfig
from ..core.params import KeyGen
from .basic import dense, init_dense
from .perceiver import init_perceiver_params, perceiver_resample


def init_projector_params(key, cfg: ProjectorConfig,
                          dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    if cfg.type == "linear":
        return {"proj": init_dense(kg(), cfg.in_dim, cfg.out_dim, True, dtype)}
    if cfg.type.startswith("mlp"):
        depth = cfg.mlp_depth
        p = {"fc0": init_dense(kg(), cfg.in_dim, cfg.out_dim, True, dtype)}
        for i in range(1, depth):
            p[f"fc{i}"] = init_dense(kg(), cfg.out_dim, cfg.out_dim, True,
                                     dtype)
        return p
    if cfg.type == "perceiver":
        assert cfg.perceiver is not None
        return {"perceiver": init_perceiver_params(kg(), cfg.perceiver,
                                                   cfg.out_dim, dtype)}
    if cfg.type == "identity":  # builder.py:51 IdentityMap — no params
        return {}
    raise ValueError(f"unknown projector type {cfg.type}")


def apply_projector(params: Dict, cfg: ProjectorConfig,
                    feats: jnp.ndarray) -> jnp.ndarray:
    """feats: [B, N, in_dim] -> [B, N or num_latents, out_dim]."""
    if cfg.type == "linear":
        return dense(params["proj"], feats)
    if cfg.type.startswith("mlp"):
        x = dense(params["fc0"], feats)
        i = 1
        while f"fc{i}" in params:
            x = dense(params[f"fc{i}"], jax.nn.gelu(x, approximate=False))
            i += 1
        return x
    if cfg.type == "perceiver":
        return perceiver_resample(params["perceiver"], cfg.perceiver, feats)
    if cfg.type == "identity":
        return feats
    raise ValueError(f"unknown projector type {cfg.type}")
