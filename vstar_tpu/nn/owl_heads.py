"""OWL-ViT detection heads: query-conditioned class logits + box regression.

Shapes follow HF OwlViTForObjectDetection (google/owlvit-base-patch16),
which the reference wraps (VisualSearch/model/owlvit/owlvit.py:20-170):
  * class head: dense0 768->512; cosine logits between normalized image
    class-embeds and the query embedding; learned per-patch logit
    shift/scale (elu+1 on scale);
  * box head: 3-layer GELU MLP 768->768->768->4, plus a grid bias so each
    patch's default box is centered on itself with patch-sized extent
    (owlvit.py:42-77), sigmoided to cxcywh in [0,1].

In the VSM, the single query embedding is the [LOC] hidden state projected
to 512 (VSM.py:120-126,543-552).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import OwlHeadConfig
from ..core.params import KeyGen
from .basic import dense, init_dense


def init_owl_head_params(key, cfg: OwlHeadConfig, dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    V = cfg.vision_dim
    return {
        "class_head": {
            "dense0": init_dense(kg(), V, cfg.query_dim, True, dtype),
            "logit_shift": init_dense(kg(), V, 1, True, dtype),
            "logit_scale": init_dense(kg(), V, 1, True, dtype),
        },
        "box_head": {
            "dense0": init_dense(kg(), V, V, True, dtype),
            "dense1": init_dense(kg(), V, V, True, dtype),
            "dense2": init_dense(kg(), V, 4, True, dtype),
        },
    }


@functools.lru_cache(maxsize=8)
def _box_bias(num_patches: int):
    """Grid box bias in logit space (owlvit.py:42-77). [N*N, 4].

    Computed (and cached) in numpy — caching a jnp value would leak tracers
    across jit traces."""
    import numpy as np
    coords = (np.stack(
        np.meshgrid(np.arange(1, num_patches + 1, dtype=np.float32),
                    np.arange(1, num_patches + 1, dtype=np.float32)),
        axis=-1) / num_patches)
    coords = np.clip(coords.reshape(-1, 2), 0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full_like(coord_bias, 1.0 / num_patches)
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return np.concatenate([coord_bias, size_bias], axis=-1)


def owl_class_logits(params: Dict, image_feats: jnp.ndarray,
                     query_embeds: jnp.ndarray) -> jnp.ndarray:
    """image_feats: [B, N, V]; query_embeds: [B, Q, query_dim].
    Returns pred_logits [B, N, Q]."""
    p = params["class_head"]
    img = dense(p["dense0"], image_feats)
    imgf = img.astype(jnp.float32)
    qf = query_embeds.astype(jnp.float32)
    imgf = imgf / (jnp.linalg.norm(imgf, axis=-1, keepdims=True) + 1e-6)
    qf = qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True) + 1e-6)
    logits = jnp.einsum("bnd,bqd->bnq", imgf, qf)
    shift = dense(p["logit_shift"], image_feats).astype(jnp.float32)
    scale = dense(p["logit_scale"], image_feats).astype(jnp.float32)
    scale = jax.nn.elu(scale) + 1.0
    return (logits + shift) * scale


def owl_box_predictions(params: Dict, image_feats: jnp.ndarray,
                        grid_size: int) -> jnp.ndarray:
    """image_feats: [B, N, V] -> boxes cxcywh in [0,1], [B, N, 4]."""
    p = params["box_head"]
    x = jax.nn.gelu(dense(p["dense0"], image_feats), approximate=False)
    x = jax.nn.gelu(dense(p["dense1"], x), approximate=False)
    x = dense(p["dense2"], x).astype(jnp.float32)
    x = x + _box_bias(grid_size)
    return jax.nn.sigmoid(x)


def owl_detect(params: Dict, cfg: OwlHeadConfig, feature_map: jnp.ndarray,
               query_embeds: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feature_map: [B, G, G, V] merged-CLS map; query_embeds: [B, Q, qdim].
    Returns (pred_logits [B, N, Q], pred_boxes [B, N, 4])."""
    B, G, _, V = feature_map.shape
    image_feats = feature_map.reshape(B, G * G, V)
    logits = owl_class_logits(params, image_feats, query_embeds)
    boxes = owl_box_predictions(params, image_feats, G)
    return logits, boxes


def owl_head_params_from_torch(sd, prefix: str = "",
                               dtype=jnp.float32) -> Dict:
    """Import HF OwlViTForObjectDetection class_head/box_head weights.
    `prefix` points above 'class_head.'/'box_head.' (usually '')."""
    from ..core.hf_import import _lin, _np

    def lin(name):
        return {"w": jnp.asarray(_lin(sd, prefix + name + ".weight"), dtype),
                "b": jnp.asarray(_np(sd[prefix + name + ".bias"]), dtype)}

    return {
        "class_head": {
            "dense0": lin("class_head.dense0"),
            "logit_shift": lin("class_head.logit_shift"),
            "logit_scale": lin("class_head.logit_scale"),
        },
        "box_head": {
            "dense0": lin("box_head.dense0"),
            "dense1": lin("box_head.dense1"),
            "dense2": lin("box_head.dense2"),
        },
    }
