"""VSM training step: CE + mask (BCE+dice) + detection (DETR) losses.

TPU-native replacement for the reference's hand-rolled DeepSpeed loop
(VisualSearch/train.py:123-567 + VSM.py:201-436): one jittable step with
static shapes (one [LOC] per row, targets padded to T_max, ground-truth
masks at a fixed resolution), pjit-sharded params/optimizer state, LoRA on
q/v projections, and the reference's trainable-set masking.

Loss weights (train.py:74-77 defaults): ce 1.0, dice 0.5, bce 2.0,
det 0.1; inner DETR weights 2/5/2.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import VSMConfig
from ..models.vsm import (encode_clip_bank, vsm_detection, vsm_segmentation)
from ..multimodal.constants import IGNORE_INDEX
from ..multimodal.splicing import apply_splice
from ..nn.llama import embed_tokens, llama_forward, lm_logits
from ..nn.vit import layernorm, vit_forward
from .detr_loss import detection_loss


@dataclasses.dataclass(frozen=True)
class VSMLossWeights:
    ce: float = 1.0
    dice: float = 0.5
    bce: float = 2.0
    det: float = 0.1


class VSMTrainState(NamedTuple):
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def make_vsm_optimizer(lr: float = 1e-4, warmup_steps: int = 100,
                       total_steps: int = 100000, grad_clip: float = 1.0,
                       trainable_mask=None, master_f32: bool = False):
    """AdamW β=(0.9,0.95) + WarmupDecayLR, matching train.py:282-318.

    trainable_mask: bool pytree — AdamW state (and f32 masters) allocate
    ONLY for trainable leaves via optax.masked; frozen leaves receive the
    (already-zeroed) gradient pass-through. Without this, LoRA training a
    7B model would allocate full-model moments (~56 GB).
    master_f32: keep f32 master weights for sub-f32 (bf16) parameter
    storage (train/master.py) — DeepSpeed bf16-mode equivalence.
    """
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        [warmup_steps])
    adamw = optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=0.0)
    if master_f32:
        from .master import with_f32_master
        adamw = with_f32_master(adamw)
    if trainable_mask is not None:
        adamw = optax.masked(adamw, trainable_mask)
    return optax.chain(optax.clip_by_global_norm(grad_clip), adamw)


def _owl_feature_map_trainable_ln(params: Dict, cfg: VSMConfig,
                                  images_owl: jnp.ndarray) -> jnp.ndarray:
    """OWL feature map with the tower frozen (stop_gradient) but the merge
    layer_norm trainable (train.py:236-245 keeps owlvit.layer_norm in the
    trainable set while the vision tower is frozen).

    Tower params are stop_gradient'd at the source (not just the output) so
    AD never traces tangents through the tower — the Pallas tower-attention
    kernel then stays on its forward-only path and no JVP work is spent on
    24 frozen layers."""
    feats = vit_forward(jax.lax.stop_gradient(params["owl_tower"]),
                        cfg.owl_vision, images_owl,
                        feature_layer=-1, apply_post_ln=True)
    feats = jax.lax.stop_gradient(feats)
    cls = feats[:, :1]
    patches = layernorm(params["owl_merge_ln"], feats[:, 1:] * cls,
                        cfg.owl_vision.layer_norm_eps)
    B = patches.shape[0]
    g = cfg.owl_vision.grid_size
    return patches.reshape(B, g, g, cfg.owl_vision.hidden_size)


def _upscale_masks(masks: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample [B,h,w] -> [B,H,W] (pred upsampled to gt resolution,
    as in VSM.py:340-342)."""
    B, h, w = masks.shape
    return jax.image.resize(masks.astype(jnp.float32),
                            (B, out_hw[0], out_hw[1]), method="bilinear")


def vsm_loss(params: Dict, cfg: VSMConfig, batch: Dict,
             weights: VSMLossWeights = VSMLossWeights(),
             compute_dtype=jnp.bfloat16
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One row = one conversation with exactly one [LOC].

    batch:
      images_clip [B,224,224,3]   (repeated per row on host)
      images_owl  [B,768,768,3]
      text_ids/feat_idx/is_feat [B,S], lens [B], labels [B,S]
      kv_valid [B,S] bool   (False at invalid [LOC] + padding;
                             dataset.py:98-103)
      loc_hidden_pos [B]    expanded position of the hidden state driving
                            the heads (position before [LOC])
      gt_masks [B,Hm,Wm] float {0,1}, masks_valid [B] bool
      tgt_boxes [B,T,4] cxcywh, tgt_valid [B,T], bboxes_valid [B]
    """
    # frozen CLIP tower + frozen linear projector (VSM freezes the mm
    # adapter, VSM.py:157); params stopped at the source so AD never traces
    # tangents through the tower (see _owl_feature_map_trainable_ln).
    bank = encode_clip_bank(jax.lax.stop_gradient(params), cfg,
                            batch["images_clip"]).astype(compute_dtype)

    tok = embed_tokens(params["llama"], batch["text_ids"], compute_dtype)
    h = apply_splice(tok, bank, batch["feat_idx"], batch["is_feat"])
    B, S = batch["text_ids"].shape
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    hidden, _ = llama_forward(params["llama"], cfg.llama, h, pos,
                              batch["lens"], kv_valid=batch["kv_valid"],
                              remat=True)
    logits = lm_logits(params["llama"], hidden)

    # --- CE (shifted, IGNORE-masked) ---
    shift_logits = logits[:, :-1]
    shift_labels = batch["labels"][:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    ce_loss = -(tok_lp * valid).sum() / jnp.maximum(valid.sum(), 1)

    # --- [LOC] hidden -> heads ---
    loc_hidden = jnp.take_along_axis(
        hidden, batch["loc_hidden_pos"][:, None, None].astype(jnp.int32),
        axis=1)[:, 0].astype(compute_dtype)
    fmap = _owl_feature_map_trainable_ln(params, cfg, batch["images_owl"])
    fmap = fmap.astype(compute_dtype)

    # --- segmentation (BCE + dice; VSM.py:14-56,402-422) ---
    mask_logits = vsm_segmentation(params, cfg, fmap, loc_hidden)
    gt = batch["gt_masks"].astype(jnp.float32)
    pred = _upscale_masks(mask_logits, gt.shape[1:3])
    mv = batch["masks_valid"].astype(jnp.float32)
    n_masks = jnp.maximum(mv.sum(), 1e-8)

    bce_el = (jnp.maximum(pred, 0) - pred * gt
              + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    bce_per = bce_el.reshape(B, -1).mean(axis=1)
    mask_bce = (bce_per * mv).sum() / n_masks

    scale = 1000.0
    p_sig = jax.nn.sigmoid(pred).reshape(B, -1)
    g_flat = gt.reshape(B, -1)
    num = 2 * (p_sig / scale * g_flat).sum(-1)
    den = (p_sig / scale).sum(-1) + (g_flat / scale).sum(-1)
    dice_per = 1 - (num + 1e-6) / (den + 1e-6)
    mask_dice = (dice_per * mv).sum() / n_masks

    # --- detection (DETR losses on 2304 candidates) ---
    det_logits, det_boxes = vsm_detection(params, cfg, fmap, loc_hidden)
    det_total, det_parts = detection_loss(
        det_logits[..., None].astype(jnp.float32),
        det_boxes.astype(jnp.float32),
        batch["tgt_boxes"], batch["tgt_valid"], batch["bboxes_valid"])

    total = (weights.ce * ce_loss
             + weights.bce * mask_bce + weights.dice * mask_dice
             + weights.det * det_total)
    metrics = {"loss": total, "ce_loss": ce_loss,
               "mask_bce_loss": weights.bce * mask_bce,
               "mask_dice_loss": weights.dice * mask_dice,
               "detection_loss": weights.det * det_total,
               "detection_loss_ce": det_parts["loss_ce"],
               "detection_loss_bbox": det_parts["loss_bbox"],
               "detection_loss_giou": det_parts["loss_giou"]}
    return total, metrics


def vsm_val_forward(params: Dict, cfg: VSMConfig, batch: Dict,
                    compute_dtype=jnp.bfloat16):
    """Validation forward: [LOC]-driven head outputs for metric computation
    (train.py:570-644). Returns (mask_logits [B,h,w], det_logits [B,Q],
    det_boxes [B,Q,4])."""
    bank = encode_clip_bank(params, cfg, batch["images_clip"])         .astype(compute_dtype)
    tok = embed_tokens(params["llama"], batch["text_ids"], compute_dtype)
    h = apply_splice(tok, bank, batch["feat_idx"], batch["is_feat"])
    B, S = batch["text_ids"].shape
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    hidden, _ = llama_forward(params["llama"], cfg.llama, h, pos,
                              batch["lens"], kv_valid=batch["kv_valid"])
    loc_hidden = jnp.take_along_axis(
        hidden, batch["loc_hidden_pos"][:, None, None].astype(jnp.int32),
        axis=1)[:, 0].astype(compute_dtype)
    fmap = _owl_feature_map_trainable_ln(params, cfg, batch["images_owl"])
    fmap = fmap.astype(compute_dtype)
    mask_logits = vsm_segmentation(params, cfg, fmap, loc_hidden)
    det_logits, det_boxes = vsm_detection(params, cfg, fmap, loc_hidden)
    return (mask_logits.astype(jnp.float32),
            det_logits.astype(jnp.float32), det_boxes.astype(jnp.float32))


def vsm_train_step(state: VSMTrainState, batch: Dict, cfg: VSMConfig,
                   optimizer, trainable_mask: Optional[Dict] = None,
                   weights: VSMLossWeights = VSMLossWeights(),
                   compute_dtype=jnp.bfloat16, grad_accum: int = 1
                   ) -> Tuple[VSMTrainState, Dict[str, jnp.ndarray]]:
    from .accumulate import accumulated_grads
    loss, metrics, grads = accumulated_grads(
        lambda p, b: vsm_loss(p, cfg, b, weights, compute_dtype),
        state.params, batch, grad_accum, has_aux=True)
    if trainable_mask is not None:
        grads = jax.tree_util.tree_map(
            lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable_mask)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return VSMTrainState(new_params, new_opt, state.step + 1), metrics
