"""SAM-style prompt encoder (text path) + mask decoder, TPU-native.

The VSM uses only the text-prompt path of SAM's PromptEncoder (the [LOC]
hidden state projected to 256-d becomes the sparse prompt;
VSM.py:322-331) and a MaskDecoder whose upscaling is interpolate+conv
instead of ConvTranspose (mask_decoder.py:15-27,78-84). Point/box/mask
prompt paths exist in the checkpoints but are never exercised at runtime;
their parameters are imported for checkpoint fidelity and ignored.

Layout: NHWC everywhere ([B, H, W, C]); torch NCHW weights are transposed
at import.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import SamDecoderConfig
from ..core.params import KeyGen
from .basic import dense, init_dense, init_layernorm, layernorm


# ---------------------------------------------------------------------------
# Prompt encoder (text path + dense PE)
# ---------------------------------------------------------------------------

def init_prompt_encoder_params(key, cfg: SamDecoderConfig,
                               dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    return {
        "pe_gaussian": jax.random.normal(
            kg(), (2, cfg.embed_dim // 2)).astype(dtype),
        "no_mask_embed": jax.random.normal(
            kg(), (cfg.embed_dim,)).astype(dtype),
    }


def _pe_encode(coords: jnp.ndarray, gaussian: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1]^2, shape [..., 2] -> [..., embed_dim]."""
    c = (2 * coords.astype(jnp.float32) - 1) @ gaussian.astype(jnp.float32)
    c = 2 * math.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_positional_encoding(params: Dict,
                              cfg: SamDecoderConfig) -> jnp.ndarray:
    """PositionEmbeddingRandom over the embedding grid
    (prompt_encoder.py:216-229). Returns [H, W, embed_dim]."""
    h, w = cfg.image_embedding_size
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [h,w,2]
    return _pe_encode(grid, params["pe_gaussian"])


def encode_text_prompt(params: Dict, cfg: SamDecoderConfig,
                       text_embeds: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """text_embeds: [B, T, embed_dim] -> (sparse [B,T,C], dense [B,H,W,C]).

    Mirrors PromptEncoder.forward with only text_embeds set
    (prompt_encoder.py:140-186)."""
    B = text_embeds.shape[0]
    h, w = cfg.image_embedding_size
    dense_emb = jnp.broadcast_to(
        params["no_mask_embed"].astype(text_embeds.dtype)[None, None, None, :],
        (B, h, w, cfg.embed_dim))
    return text_embeds, dense_emb


# ---------------------------------------------------------------------------
# TwoWayTransformer
# ---------------------------------------------------------------------------

def _init_attn(kg: KeyGen, dim: int, internal: int, dtype) -> Dict:
    return {
        "q": init_dense(kg(), dim, internal, True, dtype),
        "k": init_dense(kg(), dim, internal, True, dtype),
        "v": init_dense(kg(), dim, internal, True, dtype),
        "out": init_dense(kg(), internal, dim, True, dtype),
    }


def _attn(p: Dict, num_heads: int, q, k, v):
    qq = dense(p["q"], q)
    kk = dense(p["k"], k)
    vv = dense(p["v"], v)
    B, Lq, I = qq.shape
    Lk = kk.shape[1]
    Dh = I // num_heads
    qq = qq.reshape(B, Lq, num_heads, Dh)
    kk = kk.reshape(B, Lk, num_heads, Dh)
    vv = vv.reshape(B, Lk, num_heads, Dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qq.astype(jnp.float32),
                        kk.astype(jnp.float32)) / math.sqrt(Dh)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(B, Lq, I)
    return dense(p["out"], out)


def init_twoway_transformer_params(key, cfg: SamDecoderConfig,
                                   dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    D = cfg.embed_dim
    internal = D // cfg.attention_downsample_rate

    def one_layer():
        return {
            "self_attn": _init_attn(kg, D, D, dtype),
            "norm1": init_layernorm(D, dtype),
            "cross_t2i": _init_attn(kg, D, internal, dtype),
            "norm2": init_layernorm(D, dtype),
            "mlp_in": init_dense(kg(), D, cfg.transformer_mlp_dim, True, dtype),
            "mlp_out": init_dense(kg(), cfg.transformer_mlp_dim, D, True,
                                  dtype),
            "norm3": init_layernorm(D, dtype),
            "norm4": init_layernorm(D, dtype),
            "cross_i2t": _init_attn(kg, D, internal, dtype),
        }

    return {
        "layers": [one_layer() for _ in range(cfg.transformer_depth)],
        "final_attn": _init_attn(kg, D, internal, dtype),
        "norm_final": init_layernorm(D, dtype),
    }


def twoway_transformer(params: Dict, cfg: SamDecoderConfig,
                       image_embedding: jnp.ndarray, image_pe: jnp.ndarray,
                       point_embedding: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embedding/image_pe: [B, HW, C]; point_embedding: [B, T, C].
    Returns (queries [B,T,C], keys [B,HW,C]).  transformer.py:62-106."""
    H = cfg.transformer_num_heads
    queries, keys = point_embedding, image_embedding

    for i, lp in enumerate(params["layers"]):
        if i == 0:
            queries = _attn(lp["self_attn"], H, queries, queries, queries)
        else:
            q = queries + point_embedding
            queries = queries + _attn(lp["self_attn"], H, q, q, queries)
        queries = layernorm(lp["norm1"], queries)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + _attn(lp["cross_t2i"], H, q, k, keys)
        queries = layernorm(lp["norm2"], queries)

        h = jax.nn.relu(dense(lp["mlp_in"], queries))
        queries = queries + dense(lp["mlp_out"], h)
        queries = layernorm(lp["norm3"], queries)

        q = queries + point_embedding
        k = keys + image_pe
        keys = keys + _attn(lp["cross_i2t"], H, k, q, queries)
        keys = layernorm(lp["norm4"], keys)

    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + _attn(params["final_attn"], H, q, k, keys)
    queries = layernorm(params["norm_final"], queries)
    return queries, keys


# ---------------------------------------------------------------------------
# Mask decoder
# ---------------------------------------------------------------------------

def _conv3x3(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 3x3 same conv."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(x.dtype)


def _init_conv3x3(kg: KeyGen, cin: int, cout: int, dtype) -> Dict:
    fan_in = cin * 9
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kg(), (3, 3, cin, cout), jnp.float32,
                                -bound, bound).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def init_mask_decoder_params(key, cfg: SamDecoderConfig,
                             dtype=jnp.float32) -> Dict:
    kg = KeyGen(key)
    D = cfg.embed_dim
    n_tokens = cfg.num_mask_tokens

    def mlp3(din, dh, dout):
        return {"fc0": init_dense(kg(), din, dh, True, dtype),
                "fc1": init_dense(kg(), dh, dh, True, dtype),
                "fc2": init_dense(kg(), dh, dout, True, dtype)}

    return {
        "iou_token": jax.random.normal(kg(), (1, D)).astype(dtype),
        "mask_tokens": jax.random.normal(kg(), (n_tokens, D)).astype(dtype),
        "transformer": init_twoway_transformer_params(kg(), cfg, dtype),
        "upscale_conv1": _init_conv3x3(kg, D, D // 4, dtype),
        "upscale_ln": init_layernorm(D // 4, dtype),
        "upscale_conv2": _init_conv3x3(kg, D // 4, D // 8, dtype),
        "hyper_mlps": [mlp3(D, D, D // 8) for _ in range(n_tokens)],
        "iou_head": mlp3(D, cfg.iou_head_hidden_dim, n_tokens),
    }


def _mlp3(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    x = jax.nn.relu(dense(p["fc0"], x))
    x = jax.nn.relu(dense(p["fc1"], x))
    return dense(p["fc2"], x)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x.astype(jnp.float32), (B, 2 * H, 2 * W, C),
                            method="bilinear").astype(x.dtype)


def mask_decoder(params: Dict, cfg: SamDecoderConfig,
                 image_embeddings: jnp.ndarray, image_pe: jnp.ndarray,
                 sparse_prompt: jnp.ndarray, dense_prompt: jnp.ndarray,
                 multimask_output: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict masks (mask_decoder.py:97-186).

    image_embeddings: [B, H, W, C] (already projected to embed_dim)
    image_pe:         [H, W, C]
    sparse_prompt:    [B, T, C]
    dense_prompt:     [B, H, W, C]
    Returns (masks [B, n, 4H, 4W] logits, iou_pred [B, n]).
    """
    B = sparse_prompt.shape[0]
    D = cfg.embed_dim
    h, w = cfg.image_embedding_size

    output_tokens = jnp.concatenate(
        [params["iou_token"], params["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(
        output_tokens[None].astype(sparse_prompt.dtype),
        (B, 1 + cfg.num_mask_tokens, D))
    tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=1)

    src = image_embeddings + dense_prompt
    src_flat = src.reshape(B, h * w, D)
    pe_flat = jnp.broadcast_to(
        image_pe.reshape(1, h * w, D).astype(src.dtype), (B, h * w, D))

    hs, src_out = twoway_transformer(params["transformer"], cfg, src_flat,
                                     pe_flat, tokens)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + cfg.num_mask_tokens]

    src_img = src_out.reshape(B, h, w, D)
    up = _conv3x3(params["upscale_conv1"], _upsample2x(src_img))
    up = layernorm(params["upscale_ln"], up, eps=1e-6)
    up = jax.nn.gelu(up, approximate=False)
    up = _conv3x3(params["upscale_conv2"], _upsample2x(up))
    up = jax.nn.gelu(up, approximate=False)            # [B, 4h, 4w, D//8]

    hyper = jnp.stack(
        [_mlp3(params["hyper_mlps"][i], mask_tokens_out[:, i])
         for i in range(cfg.num_mask_tokens)], axis=1)  # [B, n, D//8]
    up_flat = up.reshape(B, 16 * h * w, D // 8)
    masks = jnp.einsum("bnc,bpc->bnp", hyper, up_flat)
    masks = masks.reshape(B, cfg.num_mask_tokens, 4 * h, 4 * w)

    iou_pred = _mlp3(params["iou_head"], iou_token_out)

    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]


# ---------------------------------------------------------------------------
# Weight import
# ---------------------------------------------------------------------------

def sam_params_from_torch(sd, cfg: SamDecoderConfig, prompt_prefix: str,
                          decoder_prefix: str, dtype=jnp.float32
                          ) -> Tuple[Dict, Dict]:
    """Import SAM PromptEncoder/MaskDecoder weights from a torch state_dict.

    prompt_prefix e.g. 'prompt_encoder.', decoder_prefix e.g. 'mask_decoder.'.
    Returns (prompt_encoder_params, mask_decoder_params).
    """
    from ..core.hf_import import _lin, _np

    def lin(name):
        return {"w": jnp.asarray(_lin(sd, name + ".weight"), dtype),
                "b": jnp.asarray(_np(sd[name + ".bias"]), dtype)}

    def ln(name):
        return {"scale": jnp.asarray(_np(sd[name + ".weight"]), dtype),
                "bias": jnp.asarray(_np(sd[name + ".bias"]), dtype)}

    def conv(name):
        w = _np(sd[name + ".weight"]).transpose(2, 3, 1, 0)  # OIHW->HWIO
        return {"w": jnp.asarray(w, dtype),
                "b": jnp.asarray(_np(sd[name + ".bias"]), dtype)}

    pe = {
        "pe_gaussian": jnp.asarray(_np(
            sd[prompt_prefix + "pe_layer.positional_encoding_gaussian_matrix"]),
            dtype),
        "no_mask_embed": jnp.asarray(_np(
            sd[prompt_prefix + "no_mask_embed.weight"])[0], dtype),
    }

    def attn(name):
        return {"q": lin(name + ".q_proj"), "k": lin(name + ".k_proj"),
                "v": lin(name + ".v_proj"), "out": lin(name + ".out_proj")}

    dp = decoder_prefix
    layers = []
    for i in range(cfg.transformer_depth):
        b = f"{dp}transformer.layers.{i}."
        layers.append({
            "self_attn": attn(b + "self_attn"),
            "norm1": ln(b + "norm1"),
            "cross_t2i": attn(b + "cross_attn_token_to_image"),
            "norm2": ln(b + "norm2"),
            "mlp_in": lin(b + "mlp.lin1"),
            "mlp_out": lin(b + "mlp.lin2"),
            "norm3": ln(b + "norm3"),
            "norm4": ln(b + "norm4"),
            "cross_i2t": attn(b + "cross_attn_image_to_token"),
        })

    decoder = {
        "iou_token": jnp.asarray(_np(sd[dp + "iou_token.weight"]), dtype),
        "mask_tokens": jnp.asarray(_np(sd[dp + "mask_tokens.weight"]), dtype),
        "transformer": {
            "layers": layers,
            "final_attn": attn(dp + "transformer.final_attn_token_to_image"),
            "norm_final": ln(dp + "transformer.norm_final_attn"),
        },
        "upscale_conv1": conv(dp + "output_upscaling.0.conv"),
        "upscale_ln": ln(dp + "output_upscaling.1"),
        "upscale_conv2": conv(dp + "output_upscaling.3.conv"),
        "hyper_mlps": [
            {"fc0": lin(f"{dp}output_hypernetworks_mlps.{i}.layers.0"),
             "fc1": lin(f"{dp}output_hypernetworks_mlps.{i}.layers.1"),
             "fc2": lin(f"{dp}output_hypernetworks_mlps.{i}.layers.2")}
            for i in range(cfg.num_mask_tokens)],
        "iou_head": {
            "fc0": lin(dp + "iou_prediction_head.layers.0"),
            "fc1": lin(dp + "iou_prediction_head.layers.1"),
            "fc2": lin(dp + "iou_prediction_head.layers.2"),
        },
    }
    return pe, decoder
