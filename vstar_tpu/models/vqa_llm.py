"""The search-aware dual-projector VQA LLM ("seal_vqa_7b"), TPU-native.

Architecture (reference LLaVA/llava/model/llava_search_arch.py):
CLIP ViT-L/14 tower -> two projectors (linear 256-token "long", perceiver
32-latent "short") -> spliced into a Vicuna-7B decoder at <image>/<object>
sentinels. The splice here is a static-layout gather (multimodal/splicing),
and generation runs on a ragged KV cache instead of HF's dynamic loops.

Checkpoint import maps craigwu/seal_vqa_7b's torch state_dict.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..core.config import VQALLMConfig
from ..core.hf_import import (linear_projector_from_torch,
                              llama_params_from_torch,
                              perceiver_params_from_torch,
                              vit_params_from_torch)
from ..core.params import KeyGen
from ..multimodal.splicing import apply_splice, bank_slot_size
from ..nn.llama import (KVCache, embed_tokens, init_llama_params,
                        llama_forward, lm_logits)
from ..nn.projectors import apply_projector, init_projector_params
from ..nn.vit import clip_patch_features, init_vit_params


def init_vqa_llm_params(key, cfg: VQALLMConfig, dtype=jnp.float32,
                        quantize_llm: bool = False) -> Dict:
    kg = KeyGen(key)
    return {
        "llama": init_llama_params(kg(), cfg.llama, dtype,
                                   quantize=quantize_llm),
        "vision": init_vit_params(kg(), cfg.vision, dtype),
        "proj_image": init_projector_params(kg(), cfg.projector_image, dtype),
        "proj_object": init_projector_params(kg(), cfg.projector_object,
                                             dtype),
    }


def vqa_llm_params_from_torch(sd, cfg: VQALLMConfig,
                              dtype=jnp.float32, strict: bool = False,
                              quantize_llm: bool = False) -> Dict:
    """Import a LlavaSearchLlamaForCausalLM state_dict.

    Key roots: 'model.*' (decoder), 'model.vision_tower.vision_tower.
    vision_model.*' (CLIP), 'model.mm_projector.*' (linear),
    'model.mm_projector_object.{0,1,2}.*' (perceiver Sequential).

    strict=True audits every checkpoint key: unknown (present but never
    consumed) or missing keys raise (core/import_audit.py).
    quantize_llm=True converts the decoder's matmul weights to
    per-channel int8 after import (nn/quant.py) — required to serve the
    7B pair on one 16 GB chip."""
    if strict:
        from ..core.import_audit import strict_import
        return strict_import(
            sd, lambda s: vqa_llm_params_from_torch(
                s, cfg, dtype, quantize_llm=quantize_llm))
    return {
        # quantization happens per-tensor on the HOST inside the importer
        # — the full bf16 decoder never materializes in HBM
        "llama": llama_params_from_torch(sd, cfg.llama, dtype,
                                         quantize=quantize_llm),
        "vision": vit_params_from_torch(
            sd, cfg.vision, prefix="model.vision_tower.vision_tower."
            "vision_model.", dtype=dtype),
        "proj_image": {"proj": linear_projector_from_torch(
            sd, "model.mm_projector", dtype)},
        "proj_object": {"perceiver": perceiver_params_from_torch(
            sd, cfg.projector_object.perceiver,
            prefix="model.mm_projector_object.", dtype=dtype)},
    }


# ---------------------------------------------------------------------------
# Vision encoding -> feature bank
# ---------------------------------------------------------------------------

def encode_feature_bank(params: Dict, cfg: VQALLMConfig,
                        image_pixels: jnp.ndarray,
                        object_pixels: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """Build the per-row splice bank.

    image_pixels:  [B, 224, 224, 3] CLIP-normalized f32, or uint8
                   (host-resized, exact PIL geometry) — u8 inputs are
                   normalized here on device so the engines upload 4x
                   less through the relay; the math is identical.
    object_pixels: [B, M, 224, 224, 3] object crops (M == cfg.max_objects;
                   unused slots may be zeros — their bank entries are never
                   gathered, so u8-black vs normalized-zero fill in dummy
                   slots cannot affect outputs).
    Returns [B, (1+M)*(256+32), hidden].  Both projectors run on every
    input, mirroring encode_images/project_features
    (llava_search_arch.py:83-93).
    """
    from ..kernels.image_ops import normalize_u8_images
    if image_pixels.dtype == jnp.uint8:
        image_pixels = normalize_u8_images(image_pixels)
    if object_pixels is not None and object_pixels.dtype == jnp.uint8:
        object_pixels = normalize_u8_images(object_pixels)
    B = image_pixels.shape[0]
    if object_pixels is None:
        M = cfg.max_objects
        object_pixels = jnp.zeros((B, M) + image_pixels.shape[1:],
                                  image_pixels.dtype)
    M = object_pixels.shape[1]
    all_pixels = jnp.concatenate(
        [image_pixels[:, None], object_pixels], axis=1)
    all_pixels = all_pixels.reshape((B * (1 + M),) + image_pixels.shape[1:])

    feats = clip_patch_features(params["vision"], cfg.vision, all_pixels)
    long = apply_projector(params["proj_image"], cfg.projector_image, feats)
    short = apply_projector(params["proj_object"], cfg.projector_object,
                            feats)
    bank = jnp.concatenate([long, short], axis=1)      # [B*(1+M), 288, D]
    slot = bank_slot_size(long.shape[1], short.shape[1])
    return bank.reshape(B, (1 + M) * slot, bank.shape[-1])


# ---------------------------------------------------------------------------
# LM forward over spliced sequences
# ---------------------------------------------------------------------------

def spliced_embeds(params: Dict, text_ids: jnp.ndarray,
                   feat_bank: jnp.ndarray, feat_idx: jnp.ndarray,
                   is_feat: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    tok = embed_tokens(params["llama"], text_ids, dtype)
    return apply_splice(tok, feat_bank, feat_idx, is_feat)


def prefill(params: Dict, cfg: VQALLMConfig, feat_bank: jnp.ndarray,
            text_ids: jnp.ndarray, feat_idx: jnp.ndarray,
            is_feat: jnp.ndarray, lens: jnp.ndarray,
            cache: KVCache, compute_dtype=jnp.bfloat16
            ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Run the spliced prompt through the decoder, filling the cache.

    Returns (last-position logits [B, vocab], hidden [B, S, D], cache)."""
    B, S = text_ids.shape
    h = spliced_embeds(params, text_ids, feat_bank, feat_idx, is_feat,
                       compute_dtype)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    hidden, cache = llama_forward(
        params["llama"], cfg.llama, h, pos, lens,
        q_offsets=jnp.zeros((B,), jnp.int32), cache=cache)
    last = jnp.take_along_axis(
        hidden, (lens - 1)[:, None, None].astype(jnp.int32), axis=1)
    logits = lm_logits(params["llama"], last)[:, 0]
    return logits, hidden, cache


def decode_step(params: Dict, cfg: VQALLMConfig, cache: KVCache,
                tok: jnp.ndarray, compute_dtype=jnp.bfloat16
                ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """One greedy decode step. tok: [B, 1] -> (logits [B, vocab],
    hidden [B, D], cache)."""
    h = embed_tokens(params["llama"], tok, compute_dtype)
    pos = cache.length[:, None]
    hidden, cache = llama_forward(
        params["llama"], cfg.llama, h, pos, cache.length + 1,
        q_offsets=cache.length, cache=cache)
    logits = lm_logits(params["llama"], hidden)[:, 0]
    return logits, hidden[:, 0], cache
