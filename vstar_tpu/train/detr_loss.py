"""DETR-style detection criterion with Hungarian matching, static shapes.

Reimplements the reference SetCriterion + HungarianMatcher
(VisualSearch/model/owlvit/owlvit.py:173-358, matcher.py:52-103) for TPU:
targets are padded to a static T_max with validity masks, costs are built
on device, and the assignment solves ON DEVICE by default with the
auction algorithm (train/auction.py — SPMD-clean, no host sync), with an
exact scipy / native-JV `pure_callback` available as method="callback"
(the reference solves on CPU every step). Padded target columns carry a
constant large cost, which cannot change the optimum over valid columns.

Deviation from the reference, intentional: the reference's giou masking
multiplies a [K] loss by a [K,1] mask (VSM.py:391), broadcasting to [K,K]
and scaling the loss by the number of valid boxes — a torch broadcasting
bug. Here the intended per-box masking is used.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_COST = 1e6


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h,
                            cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray
                        ) -> jnp.ndarray:
    """Pairwise GIoU for xyxy boxes: [N,4],[M,4] -> [N,M] (box_ops.py:50-71),
    with safe divides for padded/degenerate boxes."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    lt2 = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb2 = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh2 = jnp.clip(rb2 - lt2, 0)
    hull = wh2[..., 0] * wh2[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def _focal_costs(prob: jnp.ndarray, alpha=0.25, gamma=2.0):
    neg = (1 - alpha) * prob ** gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    return pos, neg


def match_cost(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
               tgt_boxes: jnp.ndarray, tgt_valid: jnp.ndarray,
               cost_class=2.0, cost_bbox=5.0, cost_giou=2.0) -> jnp.ndarray:
    """Cost matrix [Q, T_max] per sample (matcher.py:83-98; single class)."""
    prob = jax.nn.sigmoid(pred_logits[:, 0].astype(jnp.float32))  # [Q]
    pos, neg = _focal_costs(prob)
    c_class = (pos - neg)[:, None]
    c_bbox = jnp.sum(jnp.abs(pred_boxes[:, None, :].astype(jnp.float32)
                             - tgt_boxes[None, :, :].astype(jnp.float32)),
                     axis=-1)
    c_giou = -generalized_box_iou(box_cxcywh_to_xyxy(pred_boxes),
                                  box_cxcywh_to_xyxy(tgt_boxes))
    C = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
    return jnp.where(tgt_valid[None, :], C, PAD_COST)


def _solve_assignment_host(cost: np.ndarray, n_valid: np.ndarray
                           ) -> np.ndarray:
    """Host callback: [B,Q,T] costs -> matched query per target [B,T].
    Uses the native C++ JV solver when built, else scipy."""
    from ..native import hungarian_native
    B, Q, T = cost.shape
    out = np.zeros((B, T), np.int32)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        native = hungarian_native(cost[b, :, :n])
        if native is not None:
            out[b, :n] = native
            continue
        from scipy.optimize import linear_sum_assignment
        rows, cols = linear_sum_assignment(cost[b, :, :n])
        out[b, cols] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jnp.ndarray, tgt_valid: jnp.ndarray,
                    method: str = "auction") -> jnp.ndarray:
    """[B,Q,T] costs + [B,T] validity -> matched query index per target
    [B,T] (undefined where invalid).

    method="auction" (default): Bertsekas auction on device (train/
    auction.py) — stays inside the SPMD program (no device-0 gather) and
    runs on backends without host callbacks (the axon TPU relay).
    method="callback": exact scipy / native-JV host solve."""
    if method == "auction":
        from .auction import auction_match
        return auction_match(cost, tgt_valid)
    B, Q, T = cost.shape
    n_valid = tgt_valid.sum(axis=1).astype(jnp.int32)
    # Matching runs under no_grad in the reference (matcher.py:72); cut the
    # gradient path so the host callback is never differentiated.
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    return jax.pure_callback(
        _solve_assignment_host,
        jax.ShapeDtypeStruct((B, T), jnp.int32),
        cost, n_valid, vmap_method="sequential")


def detection_criterion(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                        tgt_boxes: jnp.ndarray, tgt_valid: jnp.ndarray,
                        sample_valid: jnp.ndarray,
                        focal_alpha: float = 0.25,
                        match_method: str = "auction"
                        ) -> Dict[str, jnp.ndarray]:
    """Full detection loss (owlvit.py:195-254 + VSM.py:366-395 masking).

    pred_logits: [B, Q, 1]; pred_boxes: [B, Q, 4] cxcywh
    tgt_boxes:   [B, T, 4] cxcywh (padded); tgt_valid: [B, T] bool
    sample_valid:[B] bool — rows whose bbox labels are real
    Returns {'loss_ce','loss_bbox','loss_giou'} scalars (already masked and
    normalized; combine with weights 2/5/2 by the caller).
    """
    B, Q, _ = pred_logits.shape
    T = tgt_boxes.shape[1]
    tgt_valid = tgt_valid & sample_valid[:, None]
    num_boxes = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)

    cost = jax.vmap(match_cost)(pred_logits, pred_boxes, tgt_boxes,
                                tgt_valid)
    match_q = hungarian_match(cost, tgt_valid, match_method)   # [B, T]
    match_q = jax.lax.stop_gradient(match_q)

    # --- classification (focal over one class) ---
    onehot = jnp.zeros((B, Q), jnp.float32)
    b_idx = jnp.arange(B)[:, None]
    onehot = onehot.at[b_idx, match_q].add(
        tgt_valid.astype(jnp.float32))                   # scatter matched=1
    onehot = jnp.clip(onehot, 0, 1)
    logits = pred_logits[..., 0].astype(jnp.float32)
    prob = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, onehot)
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    focal = ce * (1 - p_t) ** 2.0
    alpha_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
    focal = alpha_t * focal
    # reference: mean over queries, *Q, /num_boxes; per-sample then masked
    # by bboxes_valid and batch-meaned (VSM.py:389)
    loss_ce_per = focal.mean(axis=1) * Q / num_boxes
    loss_ce = (loss_ce_per * sample_valid.astype(jnp.float32)).mean()

    # --- box losses over matched pairs ---
    matched_boxes = jnp.take_along_axis(pred_boxes, match_q[..., None],
                                        axis=1)          # [B, T, 4]
    l1 = jnp.sum(jnp.abs(matched_boxes.astype(jnp.float32)
                         - tgt_boxes.astype(jnp.float32)), axis=-1)
    valid_f = tgt_valid.astype(jnp.float32)
    loss_bbox = (l1 * valid_f).sum() / num_boxes

    giou = jax.vmap(lambda p, t: jnp.diagonal(
        generalized_box_iou(box_cxcywh_to_xyxy(p), box_cxcywh_to_xyxy(t))))(
        matched_boxes, tgt_boxes)                        # [B, T]
    loss_giou = ((1.0 - giou) * valid_f).sum() / num_boxes

    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox,
            "loss_giou": loss_giou}


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def detection_loss(pred_logits, pred_boxes, tgt_boxes, tgt_valid,
                   sample_valid, weights=(2.0, 5.0, 2.0),
                   match_method: str = "auction") -> Tuple[
                       jnp.ndarray, Dict[str, jnp.ndarray]]:
    d = detection_criterion(pred_logits, pred_boxes, tgt_boxes, tgt_valid,
                            sample_valid, match_method=match_method)
    total = (weights[0] * d["loss_ce"] + weights[1] * d["loss_bbox"]
             + weights[2] * d["loss_giou"])
    return total, d
