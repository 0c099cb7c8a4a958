"""The Visual Search Model ("seal_vsm_7b"), TPU-native.

Architecture (reference VisualSearch/model/VSM.py):
  plain LLaVA-7B (CLIP ViT-L/14 tower + linear projector + Vicuna-7B)
  + OWL-ViT B/16 tower with class/box heads    (detection)
  + SAM prompt-encoder/mask-decoder            (segmentation heatmap)
  + two text MLPs projecting the [LOC] hidden state to the det query
    (hidden->hidden->512) and the seg prompt (hidden->hidden->256).

Inference contract (mirrors VSMForCausalLM.inference, VSM.py:438-554, but
with a cached decode instead of the reference's use_cache=False full
recompute): generate; take the hidden state that produced each [LOC];
det head uses the first [LOC], seg mask uses the last (reference indexes
pred_boxes[0] / pred_mask[-1], visual_search.py:222-225).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import VSMConfig
from ..core.hf_import import (_lin, _np, linear_projector_from_torch,
                              llama_params_from_torch, vit_params_from_torch)
from ..core.params import KeyGen
from ..decode.sampler import greedy_decode
from ..decode.speculative import speculative_decode
from ..multimodal.splicing import apply_splice
from ..nn.basic import dense, init_dense, init_layernorm
from ..nn.llama import embed_tokens, llama_forward, lm_logits
from ..nn.llama import init_llama_params
from ..nn.owl_heads import (init_owl_head_params, owl_detect,
                            owl_head_params_from_torch)
from ..nn.projectors import apply_projector, init_projector_params
from ..nn.sam import (dense_positional_encoding, encode_text_prompt,
                      init_mask_decoder_params, init_prompt_encoder_params,
                      mask_decoder, sam_params_from_torch)
from ..nn.vit import clip_patch_features, init_vit_params, owlvit_feature_map


def init_vsm_params(key, cfg: VSMConfig, dtype=jnp.float32,
                    quantize_llm: bool = False) -> Dict:
    kg = KeyGen(key)
    h = cfg.llama.hidden_size
    return {
        "llama": init_llama_params(kg(), cfg.llama, dtype,
                                   quantize=quantize_llm),
        "vision": init_vit_params(kg(), cfg.vision, dtype),
        "proj": init_projector_params(kg(), cfg.projector, dtype),
        "owl_tower": init_vit_params(kg(), cfg.owl_vision, dtype),
        "owl_merge_ln": init_layernorm(cfg.owl_vision.hidden_size, dtype),
        "owl_heads": init_owl_head_params(kg(), cfg.owl_head, dtype),
        "visual_projection": {"w": jax.random.normal(
            kg(), (cfg.owl_vision.hidden_size, cfg.sam.embed_dim)
        ).astype(dtype) * 0.02},
        "prompt_encoder": init_prompt_encoder_params(kg(), cfg.sam, dtype),
        "mask_decoder": init_mask_decoder_params(kg(), cfg.sam, dtype),
        "fc_det": {"fc0": init_dense(kg(), h, h, True, dtype),
                   "fc1": init_dense(kg(), h, cfg.out_dim, True, dtype)},
        "fc_seg": {"fc0": init_dense(kg(), h, h, True, dtype),
                   "fc1": init_dense(kg(), h, cfg.seg_dim, True, dtype)},
    }


def vsm_params_from_torch(sd, cfg: VSMConfig, dtype=jnp.float32,
                          strict: bool = False,
                          quantize_llm: bool = False) -> Dict:
    """Import a VSMForCausalLM state_dict (craigwu/seal_vsm_7b).

    strict=True audits every checkpoint key: unknown (present but never
    consumed) or missing keys raise (core/import_audit.py).
    quantize_llm=True: per-channel int8 decoder weights after import
    (nn/quant.py) — required to serve 7B on one 16 GB chip."""
    if strict:
        from ..core.import_audit import strict_import
        return strict_import(
            sd, lambda s: vsm_params_from_torch(
                s, cfg, dtype, quantize_llm=quantize_llm))
    pe, dec = sam_params_from_torch(sd, cfg.sam, "model.prompt_encoder.",
                                    "model.mask_decoder.", dtype)

    def fc(prefix):
        # Sequential(Linear, ReLU, Linear, Dropout) -> indices 0 and 2
        return {"fc0": {"w": jnp.asarray(_lin(sd, prefix + ".0.weight"),
                                         dtype),
                        "b": jnp.asarray(_np(sd[prefix + ".0.bias"]), dtype)},
                "fc1": {"w": jnp.asarray(_lin(sd, prefix + ".2.weight"),
                                         dtype),
                        "b": jnp.asarray(_np(sd[prefix + ".2.bias"]),
                                         dtype)}}

    params = {
        # host-side per-tensor quantization (see vqa_llm importer)
        "llama": llama_params_from_torch(sd, cfg.llama, dtype,
                                         quantize=quantize_llm),
        "vision": vit_params_from_torch(
            sd, cfg.vision,
            prefix="model.vision_tower.vision_tower.vision_model.",
            dtype=dtype),
        "proj": {"proj": linear_projector_from_torch(
            sd, "model.mm_projector", dtype)},
        "owl_tower": vit_params_from_torch(
            sd, cfg.owl_vision, prefix="model.owlvit.vision_model.",
            dtype=dtype),
        "owl_merge_ln": {
            "scale": jnp.asarray(_np(sd["model.owlvit.layer_norm.weight"]),
                                 dtype),
            "bias": jnp.asarray(_np(sd["model.owlvit.layer_norm.bias"]),
                                dtype)},
        "owl_heads": owl_head_params_from_torch(sd, prefix="model.owlvit.",
                                                dtype=dtype),
        "visual_projection": {"w": jnp.asarray(
            _lin(sd, "model.visual_projection.weight"), dtype)},
        "prompt_encoder": pe,
        "mask_decoder": dec,
        "fc_det": fc("model.text_hidden_fcs_det.0"),
        "fc_seg": fc("model.text_hidden_fcs_seg.0"),
    }
    return params


# ---------------------------------------------------------------------------
# Vision paths
# ---------------------------------------------------------------------------

def encode_clip_bank(params: Dict, cfg: VSMConfig,
                     images_clip: jnp.ndarray) -> jnp.ndarray:
    """CLIP tower + linear projector -> [B, 256, hidden] splice bank."""
    feats = clip_patch_features(params["vision"], cfg.vision, images_clip)
    return apply_projector(params["proj"], cfg.projector, feats)


def owl_features(params: Dict, cfg: VSMConfig,
                 images_owl: jnp.ndarray) -> jnp.ndarray:
    """OWL-ViT merged-CLS feature map [B, 48, 48, 768] (frozen tower)."""
    return owlvit_feature_map(params["owl_tower"], cfg.owl_vision,
                              params["owl_merge_ln"], images_owl)


def _text_fc(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return dense(p["fc1"], jax.nn.relu(dense(p["fc0"], x)))


# ---------------------------------------------------------------------------
# Heads driven by [LOC] hidden states
# ---------------------------------------------------------------------------

def vsm_detection(params: Dict, cfg: VSMConfig, feature_map: jnp.ndarray,
                  loc_hidden: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """loc_hidden: [B, llama_hidden] -> (logits [B, 2304], boxes [B,2304,4]
    cxcywh in [0,1])."""
    q = _text_fc(params["fc_det"], loc_hidden)[:, None, :]   # [B,1,512]
    logits, boxes = owl_detect(params["owl_heads"], cfg.owl_head,
                               feature_map, q)
    return logits[..., 0], boxes


def vsm_segmentation(params: Dict, cfg: VSMConfig, feature_map: jnp.ndarray,
                     loc_hidden: jnp.ndarray) -> jnp.ndarray:
    """loc_hidden: [B, llama_hidden] -> low-res mask logits [B, 192, 192]."""
    text = _text_fc(params["fc_seg"], loc_hidden)[:, None, :]  # [B,1,256]
    img = feature_map @ params["visual_projection"]["w"].astype(
        feature_map.dtype)                                     # [B,48,48,256]
    sparse, dense_emb = encode_text_prompt(params["prompt_encoder"], cfg.sam,
                                           text)
    pe = dense_positional_encoding(params["prompt_encoder"], cfg.sam)
    masks, _ = mask_decoder(params["mask_decoder"], cfg.sam, img, pe,
                            sparse, dense_emb, multimask_output=False)
    return masks[:, 0]


# ---------------------------------------------------------------------------
# Full inference pipeline (one jittable function for all three modes)
# ---------------------------------------------------------------------------

class VSMOutput(NamedTuple):
    tokens: jnp.ndarray        # int32 [B, max_new]
    num_generated: jnp.ndarray  # int32 [B]
    det_logits: jnp.ndarray    # [B, 2304] raw (apply sigmoid on host)
    det_boxes: jnp.ndarray     # [B, 2304, 4] cxcywh normalized
    mask_logits: jnp.ndarray   # [B, 192, 192] low-res seg logits
    loc_valid: jnp.ndarray     # bool [B] — a [LOC] was generated


def vsm_generate(params: Dict, cfg: VSMConfig, images_clip: jnp.ndarray,
                 images_owl: jnp.ndarray, text_ids: jnp.ndarray,
                 feat_idx: jnp.ndarray, is_feat: jnp.ndarray,
                 lens: jnp.ndarray, loc_token_id: int,
                 max_new_tokens: int = 100, eos_id: int = 2,
                 cache_len: int = 768,
                 compute_dtype=jnp.bfloat16,
                 draft_ids: "jnp.ndarray" = None,
                 spec_chunk: int = 8, kv_int8: bool = False) -> VSMOutput:
    """Generate + [LOC]-multiplexed heads (VSM.py:438-554 semantics).

    draft_ids (optional [B, max_new_tokens + spec_chunk]): when given,
    decoding runs the greedy-equivalent speculative verifier against this
    draft (decode/speculative.py) — the search answers are templated
    ("Sure, [LOC].</s>"), so a template draft collapses ~7 decode steps
    into ~2 chunk verifications.

    kv_int8: int8 KV cache (per-token/head scales, nn/llama.init_cache) —
    halves cache residency + decode-time KV reads for batched waves."""
    from ..nn.llama import init_cache

    # u8 inputs (host-resized, exact PIL geometry) normalize on device —
    # 4x less relay upload per wave, identical f32 math
    from ..kernels.image_ops import normalize_u8_images
    if images_clip.dtype == jnp.uint8:
        images_clip = normalize_u8_images(images_clip)
    if images_owl.dtype == jnp.uint8:
        images_owl = normalize_u8_images(images_owl)

    B, S = text_ids.shape
    bank = encode_clip_bank(params, cfg, images_clip).astype(compute_dtype)

    tok = embed_tokens(params["llama"], text_ids, compute_dtype)
    h = apply_splice(tok, bank, feat_idx, is_feat)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    cache = init_cache(cfg.llama, B, cache_len, compute_dtype,
                       kv_int8=kv_int8)
    hidden, cache = llama_forward(
        params["llama"], cfg.llama, h, pos, lens,
        q_offsets=jnp.zeros((B,), jnp.int32), cache=cache)
    last_idx = (lens - 1)[:, None, None].astype(jnp.int32)
    last_hidden = jnp.take_along_axis(hidden, last_idx, axis=1)[:, 0]
    last_logits = lm_logits(params["llama"],
                            last_hidden[:, None])[:, 0]

    if draft_ids is not None:
        res = speculative_decode(params["llama"], cfg.llama, cache,
                                 last_logits, last_hidden, draft_ids,
                                 max_new_tokens, [eos_id], spec_chunk,
                                 compute_dtype)
    else:
        res = greedy_decode(params["llama"], cfg.llama, cache, last_logits,
                            last_hidden, max_new_tokens, [eos_id],
                            compute_dtype)

    # [LOC] selection among generated tokens (within each row's valid span).
    pos_ids = jnp.arange(max_new_tokens)[None]
    is_loc = jnp.logical_and(res.tokens == loc_token_id,
                             pos_ids < res.num_generated[:, None])
    loc_valid = jnp.any(is_loc, axis=1)
    first_loc = jnp.argmax(is_loc, axis=1)
    last_loc = (max_new_tokens - 1
                - jnp.argmax(is_loc[:, ::-1], axis=1))
    first_loc = jnp.where(loc_valid, first_loc, 0)
    last_loc = jnp.where(loc_valid, last_loc, 0)

    def take(idx):
        return jnp.take_along_axis(
            res.hiddens, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    loc_hidden_det = take(first_loc).astype(compute_dtype)
    loc_hidden_seg = take(last_loc).astype(compute_dtype)

    fmap = owl_features(params, cfg, images_owl).astype(compute_dtype)
    det_logits, det_boxes = vsm_detection(params, cfg, fmap, loc_hidden_det)
    mask_logits = vsm_segmentation(params, cfg, fmap, loc_hidden_seg)

    return VSMOutput(tokens=res.tokens, num_generated=res.num_generated,
                     det_logits=det_logits.astype(jnp.float32),
                     det_boxes=det_boxes.astype(jnp.float32),
                     mask_logits=mask_logits.astype(jnp.float32),
                     loc_valid=loc_valid)
