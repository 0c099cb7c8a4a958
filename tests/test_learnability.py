"""Learnability gate (VERDICT r2 weak #5): the REAL VSM training stack —
`vsm_train_step` (CE + mask BCE/dice + DETR with the on-device auction
matcher), masked AdamW + WarmupDecayLR, LoRA adapters, the production
collator — must actually LEARN, not merely run: trained on a synthetic
color-localization task, held-out det-acc@IoU0.5 through train/validate.py
must reach >= 0.9. This is the signal the reference gates checkpoints on
(VisualSearch/train.py:389-411,570-644).

Task: a colored square occupies one of four OWL grid cells; the box head
is frozen at the grid anchors (its final layer zeroed — the reference
freezes box_head too, train.py:236-245), so detection accuracy is pure
class-head learning: score the anchor whose cell holds the square."""

import random

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tests.test_data import WordTokenizer
from vstar_tpu.core.config import vsm_tiny
from vstar_tpu.data.preprocess import clip_preprocess, owlvit_preprocess
from vstar_tpu.data.vsm_collate import VSMRow, collate_vsm_rows
from vstar_tpu.data.vsm_datasets import _conversation
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.nn.owl_heads import _box_bias
from vstar_tpu.train.lora import add_lora, vsm_trainable_mask
from vstar_tpu.train.validate import validate
from vstar_tpu.train.vsm_train import (VSMLossWeights, VSMTrainState,
                                       make_vsm_optimizer, vsm_train_step,
                                       vsm_val_forward)

CFG = vsm_tiny()
GRID = CFG.owl_vision.grid_size          # 3 -> 9 anchors
CELLS = [(0, 0), (0, 1), (1, 0), (1, 1)]  # interior-ish cells
RED = (235, 20, 20)


def _anchors():
    """The frozen box head's exact output: sigmoid(grid bias)."""
    return 1.0 / (1.0 + np.exp(-_box_bias(GRID)))


def _make_row(cell, rng, tok_rng):
    i, j = cell
    side = CFG.owl_vision.image_size     # 48
    img = rng.randint(30, 70, (side, side, 3)).astype(np.uint8)
    cx, cy = int((j + 1) / GRID * side), int((i + 1) / GRID * side)
    half = side // (2 * GRID)
    img[cy - half:cy + half, cx - half:cx + half] = RED
    pil = Image.fromarray(img)
    mask = np.zeros((side, side), np.float32)
    mask[cy - half:cy + half, cx - half:cx + half] = 1.0
    anchor = _anchors()[i * GRID + j].astype(np.float32)
    return VSMRow(
        image_clip=clip_preprocess(pil, CFG.vision.image_size),
        image_owl=owlvit_preprocess(pil, side),
        source=_conversation("red square", tok_rng),
        gt_mask=mask, mask_valid=True,
        tgt_boxes=anchor[None], bboxes_valid=True)


def _batch(tok, loc_id, rng, tok_rng, B=8):
    rows = [_make_row(CELLS[rng.randint(len(CELLS))], rng, tok_rng)
            for _ in range(B)]
    return collate_vsm_rows(rows, tok, loc_id,
                            n_image_tokens=CFG.image_tokens,
                            seq_bucket=64, t_max=2, mask_res=12)


def test_vsm_training_learns_localization():
    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")
    params = init_vsm_params(jax.random.PRNGKey(0), CFG)
    # freeze the box head AT the grid anchors (zeroed final layer) — it is
    # frozen in the reference's trainable set; anchors make IoU@0.5
    # equivalent to picking the right cell
    params["owl_heads"]["box_head"]["dense2"] = jax.tree_util.tree_map(
        jnp.zeros_like, params["owl_heads"]["box_head"]["dense2"])
    params["llama"] = add_lora(params["llama"], jax.random.PRNGKey(1),
                               r=2, alpha=4)
    mask = vsm_trainable_mask(params)

    steps = 220
    opt = make_vsm_optimizer(lr=3e-3, warmup_steps=20, total_steps=steps,
                             trainable_mask=mask)
    state = VSMTrainState(params, opt.init(params),
                          jnp.zeros((), jnp.int32))
    weights = VSMLossWeights()
    step_fn = jax.jit(
        lambda st, b: vsm_train_step(st, b, CFG, opt, mask, weights,
                                     compute_dtype=jnp.float32),
        donate_argnums=(0,))

    rng = np.random.RandomState(0)
    tok_rng = random.Random(0)
    losses = []
    for _ in range(steps):
        b = _batch(tok, loc_id, rng, tok_rng)
        state, m = step_fn(state, {k: jnp.asarray(v)
                                   for k, v in b.items()})
        losses.append(float(m["loss"]))

    # held-out: fresh noise backgrounds, every cell
    val_rng = np.random.RandomState(999)
    jfwd = jax.jit(lambda p, b: vsm_val_forward(p, CFG, b,
                                                compute_dtype=jnp.float32))

    def forward_fn(p, b):
        return jfwd(p, {k: jnp.asarray(v) for k, v in b.items()})

    batches = [_batch(tok, loc_id, val_rng, random.Random(7))
               for _ in range(4)]
    metrics = validate(state.params, CFG, batches, forward_fn)
    print(f"learnability: det_acc={metrics['det_acc']:.3f} "
          f"giou={metrics['giou']:.3f} loss {losses[0]:.2f}->"
          f"{np.mean(losses[-20:]):.2f}")
    assert np.mean(losses[-20:]) < losses[0]
    assert metrics["det_acc"] >= 0.9, metrics
