"""Training-path tests: DETR criterion, Hungarian matching, LoRA, and one
full VSM train step on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstar_tpu.core.config import vsm_tiny
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.multimodal.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vstar_tpu.multimodal.splicing import build_layout, stack_layouts
from vstar_tpu.train.detr_loss import (box_cxcywh_to_xyxy,
                                       detection_criterion,
                                       generalized_box_iou, hungarian_match,
                                       match_cost)
from vstar_tpu.train.lora import (add_lora, merge_lora, vsm_trainable_mask)
from vstar_tpu.train.vsm_train import (VSMTrainState, make_vsm_optimizer,
                                       vsm_loss, vsm_train_step)

CFG = vsm_tiny()


def test_giou_matches_manual():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b2 = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0]])
    g = np.asarray(generalized_box_iou(b1, b2))
    # overlap 1, union 7, hull 9 -> giou = 1/7 - 2/9
    np.testing.assert_allclose(g[0, 0], 1 / 7 - 2 / 9, rtol=1e-5)
    np.testing.assert_allclose(g[0, 1], 1.0, rtol=1e-5)


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(0)
    B, Q, T = 2, 6, 4
    cost = rng.rand(B, Q, T).astype(np.float32)
    tgt_valid = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool)
    got = np.asarray(hungarian_match(jnp.asarray(cost),
                                     jnp.asarray(tgt_valid)))
    for b in range(B):
        n = tgt_valid[b].sum()
        rows, cols = linear_sum_assignment(cost[b, :, :n])
        want = np.zeros(T, np.int32)
        want[cols] = rows
        np.testing.assert_array_equal(got[b, :n], want[:n])


def test_detection_criterion_perfect_predictions():
    Q, T = 9, 3
    rng = np.random.RandomState(1)
    tgt = rng.uniform(0.2, 0.5, (1, T, 4)).astype(np.float32)
    pred_boxes = np.tile(np.array([[0.9, 0.9, 0.05, 0.05]], np.float32),
                         (Q, 1))[None]
    pred_logits = np.full((1, Q, 1), -8.0, np.float32)
    # plant the targets at queries 2,5,7 with confident logits
    for q, t in zip([2, 5, 7], range(T)):
        pred_boxes[0, q] = tgt[0, t]
        pred_logits[0, q, 0] = 8.0
    d = detection_criterion(jnp.asarray(pred_logits),
                            jnp.asarray(pred_boxes), jnp.asarray(tgt),
                            jnp.ones((1, T), bool), jnp.ones((1,), bool))
    assert float(d["loss_bbox"]) < 1e-5
    assert float(d["loss_giou"]) < 1e-4
    assert float(d["loss_ce"]) < 0.05

    # invalid sample -> everything masked to ~0
    d0 = detection_criterion(jnp.asarray(pred_logits),
                             jnp.asarray(pred_boxes), jnp.asarray(tgt),
                             jnp.ones((1, T), bool), jnp.zeros((1,), bool))
    assert float(d0["loss_bbox"]) == 0.0 and float(d0["loss_ce"]) == 0.0


def test_lora_zero_init_and_merge():
    from vstar_tpu.core.config import _tiny_llama
    from vstar_tpu.nn.llama import (embed_tokens, init_llama_params,
                                    llama_forward)
    cfg = _tiny_llama()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    lparams = dict(params)
    lparams = add_lora(params, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    h = embed_tokens(params, ids, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    lens = jnp.full((1,), 8, jnp.int32)
    base, _ = llama_forward(params, cfg, h, pos, lens)
    with_lora, _ = llama_forward(lparams, cfg, h, pos, lens)
    # B=0 init => identical outputs
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               rtol=1e-6, atol=1e-6)
    # perturb B, merge, and check merged == unmerged-with-adapters
    lparams["layers"]["attn"]["lora"]["wq_b"] = (
        jax.random.normal(jax.random.PRNGKey(3),
                          lparams["layers"]["attn"]["lora"]["wq_b"].shape)
        * 0.02)
    out_adapter, _ = llama_forward(lparams, cfg, h, pos, lens)
    merged = dict(lparams)
    merged = merge_lora(lparams)
    out_merged, _ = llama_forward(merged, cfg, h, pos, lens)
    np.testing.assert_allclose(np.asarray(out_adapter),
                               np.asarray(out_merged), rtol=2e-5, atol=2e-5)


def _make_batch(B=2, S=48):
    rng = np.random.RandomState(3)
    n_img = CFG.image_tokens
    ids = [1, IMAGE_TOKEN_INDEX, 9, 10, 11, 12, 13]
    labels = [IGNORE_INDEX] * 5 + [12, 13]
    lay = build_layout(ids, S, n_long=n_img, n_short=0, image_long=True,
                       labels=labels)
    text_ids, feat_idx, is_feat, lens, labs = stack_layouts([lay] * B)
    kv_valid = np.zeros((B, S), bool)
    for b in range(B):
        kv_valid[b, :lay.length] = True
    g = CFG.sam.image_embedding_size[0] * 4
    return {
        "images_clip": jnp.asarray(rng.randn(B, 28, 28, 3), jnp.float32),
        "images_owl": jnp.asarray(rng.randn(B, 48, 48, 3), jnp.float32),
        "text_ids": jnp.asarray(text_ids),
        "feat_idx": jnp.asarray(feat_idx),
        "is_feat": jnp.asarray(is_feat),
        "lens": jnp.asarray(lens),
        "labels": jnp.asarray(labs),
        "kv_valid": jnp.asarray(kv_valid),
        "loc_hidden_pos": jnp.asarray([lay.length - 2] * B, jnp.int32),
        "gt_masks": jnp.asarray(
            (rng.rand(B, g, g) > 0.5).astype(np.float32)),
        "masks_valid": jnp.ones((B,), bool),
        "tgt_boxes": jnp.asarray(
            rng.uniform(0.2, 0.5, (B, 4, 4)), jnp.float32),
        "tgt_valid": jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], bool),
        "bboxes_valid": jnp.ones((B,), bool),
    }


def test_vsm_train_step_runs_and_respects_freezing():
    params = init_vsm_params(jax.random.PRNGKey(5), CFG)
    params["llama"] = add_lora(params["llama"], jax.random.PRNGKey(6),
                               r=2, alpha=4)
    mask = vsm_trainable_mask(params)
    opt = make_vsm_optimizer(lr=1e-3, warmup_steps=0, total_steps=10)
    state = VSMTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _make_batch()

    loss0, metrics0 = jax.jit(
        lambda p, b: vsm_loss(p, CFG, b, compute_dtype=jnp.float32))(
        params, batch)
    assert np.isfinite(float(loss0))
    for k in ("ce_loss", "mask_bce_loss", "mask_dice_loss",
              "detection_loss"):
        assert np.isfinite(float(metrics0[k])), k

    new_state, metrics = jax.jit(
        lambda st, b: vsm_train_step(st, b, CFG, opt, mask,
                                     compute_dtype=jnp.float32))(
        state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # frozen: base decoder weight and CLIP tower unchanged
    np.testing.assert_array_equal(
        np.asarray(new_state.params["llama"]["layers"]["attn"]["wq"]),
        np.asarray(params["llama"]["layers"]["attn"]["wq"]))
    np.testing.assert_array_equal(
        np.asarray(new_state.params["vision"]["patch_embed"]["w"]),
        np.asarray(params["vision"]["patch_embed"]["w"]))
    # trainable: lora B and the seg text FC moved (A's grad is 0 while B=0)
    assert not np.array_equal(
        np.asarray(new_state.params["llama"]["layers"]["attn"]["lora"]["wq_b"]),
        np.asarray(params["llama"]["layers"]["attn"]["lora"]["wq_b"]))
    assert not np.array_equal(
        np.asarray(new_state.params["fc_seg"]["fc0"]["w"]),
        np.asarray(params["fc_seg"]["fc0"]["w"]))


def test_grad_accumulation_matches_full_batch():
    from vstar_tpu.train.accumulate import accumulated_grads
    params = {"w": jnp.ones((4, 4)) * 0.5}

    def loss_fn(p, b):
        y = b["x"] @ p["w"]
        return jnp.mean((y - b["t"]) ** 2), {"m": jnp.mean(y)}

    rng = np.random.RandomState(0)
    batch = {"x": jnp.asarray(rng.randn(8, 4), jnp.float32),
             "t": jnp.asarray(rng.randn(8, 4), jnp.float32)}

    def mean_loss(p, b):
        l, aux = loss_fn(p, b)
        return l, aux

    l1, a1, g1 = accumulated_grads(mean_loss, params, batch, 1,
                                   has_aux=True)
    l4, a4, g4 = accumulated_grads(mean_loss, params, batch, 4,
                                   has_aux=True)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1["w"]), np.asarray(g4["w"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(a1["m"]), float(a4["m"]), rtol=1e-6)
