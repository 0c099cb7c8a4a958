"""Validation pipeline test: ValDataset -> collate -> val forward ->
gIoU/cIoU/det-acc on the tiny config with synthetic refcoco-val data."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vsm_tiny
from vstar_tpu.data.rle import rle_encode
from vstar_tpu.data.val_dataset import ValDataset
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.train.validate import (det_top1_correct,
                                      mask_intersection_union, validate)
from vstar_tpu.train.vsm_train import vsm_val_forward
from tests.test_data import WordTokenizer

CFG = vsm_tiny()


def test_metric_helpers():
    pred = np.full((4, 4), -1.0, np.float32)
    pred[1:3, 1:3] = 1.0
    gt = np.zeros((4, 4), np.float32)
    gt[1:3, 1:3] = 1.0
    i, u = mask_intersection_union(pred, gt)
    assert i == 4.0 and u == 4.0
    # det: top box equals gt
    logits = np.asarray([0.1, 0.9, 0.2], np.float32)
    boxes = np.asarray([[0.2, 0.2, 0.1, 0.1], [0.5, 0.5, 0.2, 0.2],
                        [0.8, 0.8, 0.1, 0.1]], np.float32)
    assert det_top1_correct(logits, boxes,
                            np.asarray([[0.5, 0.5, 0.2, 0.2]]))
    assert not det_top1_correct(logits, boxes,
                                np.asarray([[0.1, 0.1, 0.05, 0.05]]))


def test_val_dataset_and_validate(tmp_path):
    os.makedirs(tmp_path / "refer_seg" / "imgs")
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
        tmp_path / "refer_seg" / "imgs" / "v.jpg")
    mask = np.zeros((40, 60), np.uint8)
    mask[10:20, 10:30] = 1
    items = [{"image": "imgs/v.jpg", "expression": "the dark area",
              "segmentation": rle_encode(mask),
              "bbox": [10, 10, 30, 20]}] * 4
    json.dump(items, open(tmp_path / "refer_seg" / "refcoco_val.json", "w"))

    ds = ValDataset(str(tmp_path), clip_size=28, owl_size=48)
    assert len(ds) == 4
    row = ds[0]
    assert row.gt_mask.sum() == 10 * 20
    np.testing.assert_allclose(row.tgt_boxes[0],
                               [20 / 60, 15 / 40, 20 / 60, 10 / 40],
                               rtol=1e-5)

    params = init_vsm_params(jax.random.PRNGKey(0), CFG)
    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")

    jfwd = jax.jit(lambda p, b: vsm_val_forward(
        p, CFG, b, compute_dtype=jnp.float32))

    def forward_fn(p, b):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        return jfwd(p, jb)

    metrics = validate(params, CFG,
                       ds.batches(tok, loc_id, batch_size=2,
                                  n_image_tokens=CFG.image_tokens,
                                  seq_bucket=64, mask_res=24),
                       forward_fn)
    assert set(metrics) == {"giou", "ciou", "det_acc"}
    for v in metrics.values():
        assert np.isfinite(v) and 0.0 <= v <= 1.0


def test_val_batches_process_sharding(tmp_path):
    """rank/world sharding splits the val set disjointly and covers it
    (DistributedSampler equivalent, reference train.py:355-371)."""
    os.makedirs(tmp_path / "refer_seg" / "imgs")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        tmp_path / "refer_seg" / "imgs" / "v.jpg")
    mask = np.zeros((8, 8), np.uint8)
    mask[2:4, 2:4] = 1
    items = [{"image": "imgs/v.jpg", "expression": f"thing {i}",
              "segmentation": rle_encode(mask), "bbox": [2, 2, 4, 4]}
             for i in range(7)]
    json.dump(items, open(tmp_path / "refer_seg" / "refcoco_val.json", "w"))
    ds = ValDataset(str(tmp_path), clip_size=28, owl_size=48)
    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")
    kw = dict(n_image_tokens=CFG.image_tokens, seq_bucket=64, mask_res=8)

    def n_rows(rank, world):
        return sum(b["text_ids"].shape[0]
                   for b in ds.batches(tok, loc_id, batch_size=1,
                                       rank=rank, world=world, **kw))

    # 7 items over 2 shards: 4 + 3, disjoint interleaved split
    assert n_rows(0, 2) == 4 and n_rows(1, 2) == 3
    # defaults (single process) see everything
    assert n_rows(None, None) == 7
