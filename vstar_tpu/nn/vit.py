"""CLIP-style pre-LN vision transformer (pure JAX, stacked-layer scan).

One implementation serves both towers of the system:
  * CLIP ViT-L/14 @224 — the LLaVA vision tower. LLaVA takes the
    penultimate layer's hidden states and drops CLS ("patch" select,
    reference LLaVA/llava/model/multimodal_encoder/clip_encoder.py:29-37).
  * OWL-ViT ViT-B/16 @768 — the VSM detection tower. OWL-ViT takes the
    final hidden states + post-layernorm, then CLS-merges into a 48x48
    feature map (reference VisualSearch/model/owlvit/owlvit.py:121-148).

Inputs are [B, H, W, 3] (NHWC, TPU-native layout), already normalized.
Patchify is a reshape + one big matmul (MXU-friendly; no conv needed since
stride == kernel).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.config import ViTConfig
from ..core.params import KeyGen, dense_init
from ..kernels.tower_attention import tower_attention
from .basic import ACTIVATIONS, dense, init_dense, init_layernorm, layernorm


def init_vit_params(key, cfg: ViTConfig, dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    D = cfg.hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * 3

    def one_layer(k):
        kg2 = KeyGen(k)
        return {
            "ln1": init_layernorm(D, dtype),
            "ln2": init_layernorm(D, dtype),
            "attn": {
                "wq": init_dense(kg2(), D, D, True, dtype),
                "wk": init_dense(kg2(), D, D, True, dtype),
                "wv": init_dense(kg2(), D, D, True, dtype),
                "wo": init_dense(kg2(), D, D, True, dtype),
            },
            "mlp": {
                "fc1": init_dense(kg2(), D, cfg.intermediate_size, True, dtype),
                "fc2": init_dense(kg2(), cfg.intermediate_size, D, True, dtype),
            },
        }

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[one_layer(kg()) for _ in range(cfg.num_layers)])

    params = {
        "patch_embed": {"w": dense_init(kg(), patch_dim, D, dtype=dtype)},
        "position_embedding": (jax.random.normal(
            kg(), (cfg.seq_len, D)) * 0.02).astype(dtype),
        "layers": layers,
        "pre_ln": init_layernorm(D, dtype),
        "post_ln": init_layernorm(D, dtype),
    }
    if cfg.use_class_embedding:
        params["class_embedding"] = (jax.random.normal(kg(), (D,))
                                     * 0.02).astype(dtype)
    return params


def patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, N, patch*patch*C] in (ph, pw, c) raster order,
    matching the torch conv-weight layout used by the importer."""
    B, H, W, C = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def _xla_attention(q, k, v):
    """Fused-XLA softmax attention — faster than any kernel at short tower
    lengths (CLIP @224 is 257 tokens), where the [S, S] logits fit cache."""
    Dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * Dh ** -0.5,
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    B, S, H, _ = q.shape
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, H * Dh)


def _vit_attention(p: Dict, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, S, D = x.shape
    Dh = D // num_heads
    q = dense(p["wq"], x).reshape(B, S, num_heads, Dh)
    k = dense(p["wk"], x).reshape(B, S, num_heads, Dh)
    v = dense(p["wv"], x).reshape(B, S, num_heads, Dh)

    # tower_attention keeps the [S, S] logits in VMEM (the einsum path
    # writes ~255 MB of f32 logits per OWL image to HBM). The generic
    # flash kernel measured 83 ms here (head padded 64->128, decode-shaped
    # KV layout); the tower-shaped kernel replaces it. Off-TPU it falls
    # back to the fused-XLA einsum internally.
    out = tower_attention(q, k, v).reshape(B, S, D) if S >= 512 \
        else _xla_attention(q, k, v)
    return dense(p["wo"], out)


def vit_forward(params: Dict, cfg: ViTConfig, pixel_values: jnp.ndarray,
                feature_layer: Optional[int] = None,
                apply_post_ln: bool = False) -> jnp.ndarray:
    """Encode images to token features.

    pixel_values: [B, H, W, 3] normalized.
    feature_layer: overrides cfg.feature_layer; -1 = last layer's output,
      -2 = penultimate (LLaVA default). Layers after the selected one are
      skipped entirely (they exist in the checkpoint but contribute nothing).
    apply_post_ln: apply the final post-layernorm (OWL-ViT path). The CLIP
      "select hidden layer" path must NOT apply it.
    Returns [B, seq, D] where seq includes CLS at index 0 (if configured).
    """
    fl = cfg.feature_layer if feature_layer is None else feature_layer
    n_used = cfg.num_layers + 1 + fl if fl < 0 else fl + 1
    assert 1 <= n_used <= cfg.num_layers, (fl, cfg.num_layers)

    x = patchify(pixel_values, cfg.patch_size)
    x = x @ params["patch_embed"]["w"].astype(x.dtype)
    if cfg.use_class_embedding:
        cls = jnp.broadcast_to(
            params["class_embedding"].astype(x.dtype)[None, None, :],
            (x.shape[0], 1, x.shape[2]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(x.dtype)[None]
    if "pre_ln" in params:
        x = layernorm(params["pre_ln"], x, cfg.layer_norm_eps)

    act = ACTIVATIONS[cfg.hidden_act]

    def layer(carry, lp):
        h = layernorm(lp["ln1"], carry, cfg.layer_norm_eps)
        carry = carry + _vit_attention(lp["attn"], h, cfg.num_heads)
        h = layernorm(lp["ln2"], carry, cfg.layer_norm_eps)
        h = dense(lp["mlp"]["fc2"], act(dense(lp["mlp"]["fc1"], h)))
        return carry + h, None

    used_layers = jax.tree_util.tree_map(lambda a: a[:n_used],
                                         params["layers"])
    x, _ = jax.lax.scan(layer, x, used_layers)

    if apply_post_ln:
        x = layernorm(params["post_ln"], x, cfg.layer_norm_eps)
    return x


def clip_patch_features(params: Dict, cfg: ViTConfig,
                        pixel_values: jnp.ndarray) -> jnp.ndarray:
    """LLaVA 'patch' feature select: penultimate hidden layer, CLS dropped
    (clip_encoder.py:29-37). Returns [B, num_patches, D]."""
    feats = vit_forward(params, cfg, pixel_values, apply_post_ln=False)
    return feats[:, 1:] if cfg.use_class_embedding else feats


def owlvit_feature_map(params: Dict, cfg: ViTConfig, merge_ln: Dict,
                       pixel_values: jnp.ndarray) -> jnp.ndarray:
    """OWL-ViT merged-CLS feature map (owlvit.py:121-148):
    post-LN hidden states; patches multiplied by broadcast CLS; extra LN;
    reshaped to [B, grid, grid, D]."""
    feats = vit_forward(params, cfg, pixel_values, feature_layer=-1,
                        apply_post_ln=True)
    cls = feats[:, :1]
    patches = feats[:, 1:] * cls
    patches = layernorm(merge_ln, patches, cfg.layer_norm_eps)
    B = patches.shape[0]
    g = cfg.grid_size
    return patches.reshape(B, g, g, cfg.hidden_size)
