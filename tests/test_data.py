"""Data pipeline tests: RLE decode, label masking, VSM collate, dataset
sampling with synthetic fixtures."""

import json
import os
import zlib

import numpy as np
import pytest
from PIL import Image

from vstar_tpu.data.label_masking import preprocess_v1
from vstar_tpu.data.rle import polygons_to_mask, rle_decode, rle_encode
from vstar_tpu.data.vsm_collate import VSMRow, collate_vsm_rows
from vstar_tpu.multimodal.constants import (IGNORE_INDEX,
                                            IMAGE_TOKEN_INDEX)

VOCAB = 320


class WordTokenizer:
    """SentencePiece-like toy: BOS prepended, '</s>' its own token (id 2),
    stable word ids."""

    bos_token_id = 1
    eos_token_id = 2
    unk_token = "<unk>"
    pad_token_id = 0
    model_max_length = 512

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def _word_id(self, w):
        if w == "</s>":
            return 2
        if w == "[LOC]":
            return 3
        return 4 + zlib.crc32(w.encode()) % (VOCAB - 4)

    def __call__(self, text, add_special_tokens=True):
        words = []
        text = text.replace("</s>", " </s> ").replace("[LOC]", " [LOC] ")
        for chunk in text.split():
            words.append(chunk)
        ids = ([self.bos_token_id] if add_special_tokens else []) + \
            [self._word_id(w) for w in words]
        return self._Out(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(13, 17) > 0.6).astype(np.uint8)
    rle = rle_encode(mask)
    np.testing.assert_array_equal(rle_decode(rle), mask)
    # all-zero and all-one edge cases
    for m in (np.zeros((4, 5), np.uint8), np.ones((4, 5), np.uint8)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_polygon_rasterization():
    mask = polygons_to_mask([[1, 1, 8, 1, 8, 8, 1, 8]], 10, 10)
    assert mask[4, 4] == 1 and mask[0, 0] == 0 and mask[9, 9] == 0


def test_preprocess_v1_masks_instructions():
    tok = WordTokenizer()
    source = [{"from": "human", "value": "<image>\nwhat is this ?"},
              {"from": "gpt", "value": "a red cup"},
              {"from": "human", "value": "and color ?"},
              {"from": "gpt", "value": "red"}]
    enc = preprocess_v1(source, tok, has_image=True)
    ids, labels = enc["input_ids"], enc["labels"]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # not fully ignored (no tokenization mismatch with this tokenizer)
    assert (labels != IGNORE_INDEX).any()
    # answer words appear in the unmasked portion
    ans_ids = {tok._word_id(w) for w in ["a", "red", "cup"]}
    unmasked = set(labels[labels != IGNORE_INDEX].tolist())
    assert ans_ids <= unmasked
    # the question words (before first ASSISTANT:) are masked
    q_pos = np.nonzero(ids == tok._word_id("what"))[0]
    assert (labels[q_pos] == IGNORE_INDEX).all()


def _mkrow(valid_boxes=True, loc=True):
    src = [{"from": "human", "value": "<image>\nPlease locate the cat."},
           {"from": "gpt", "value": "Sure, [LOC]." if loc else "No."}]
    return VSMRow(
        image_clip=np.zeros((28, 28, 3), np.float32),
        image_owl=np.zeros((48, 48, 3), np.float32),
        source=src,
        gt_mask=np.ones((30, 40), np.float32),
        mask_valid=True,
        tgt_boxes=np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32),
        bboxes_valid=valid_boxes)


def test_collate_vsm_rows():
    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")
    batch = collate_vsm_rows([_mkrow(True), _mkrow(False)], tok, loc_id,
                             n_image_tokens=4, seq_bucket=64, t_max=8,
                             mask_res=24, use_mm_start_end=True)
    assert batch["text_ids"].shape == (2, 64)
    assert batch["gt_masks"].shape == (2, 24, 24)
    assert batch["bboxes_valid"].tolist() == [True, False]
    # row 0: [LOC] attended; row 1: [LOC] key masked out
    loc_positions_0 = np.nonzero(batch["text_ids"][0] == loc_id)[0]
    loc_positions_1 = np.nonzero(batch["text_ids"][1] == loc_id)[0]
    assert len(loc_positions_0) == 1 and len(loc_positions_1) == 1
    assert batch["kv_valid"][0, loc_positions_0[0]]
    assert not batch["kv_valid"][1, loc_positions_1[0]]
    # loc_hidden_pos = position before [LOC]
    assert batch["loc_hidden_pos"][0] == loc_positions_0[0] - 1
    # image expanded into 4 feature tokens before the question
    assert batch["is_feat"][0].sum() == 4


def test_vqa_dataset_and_hybrid(tmp_path):
    base = tmp_path
    os.makedirs(base / "vqa_data" / "coco_images")
    img = Image.fromarray(np.zeros((32, 48, 3), np.uint8))
    img.save(base / "vqa_data" / "coco_images" / "img0.jpg")
    data = [{"image": "img0.jpg",
             "conversations": [
                 {"from": "human", "value": "<image>\nwhere is the cup?"},
                 {"from": "gpt", "value": "on the table"}]}]
    json.dump(data, open(base / "vqa_data"
                         / "possible_locations_conv_86k.json", "w"))

    from vstar_tpu.data.vsm_datasets import HybridDataset, VQADataset
    ds = VQADataset(str(base))
    rows = ds.sample_rows()
    assert len(rows) == 1
    assert not rows[0].bboxes_valid
    assert "[LOC]" in rows[0].source[0]["value"]
    assert rows[0].source[0]["value"].startswith("<image>[LOC]")

    hybrid = HybridDataset([ds], [1.0], samples_per_epoch=5)
    batches = list(hybrid.batches(2))
    assert len(batches) == 2 and all(len(b) == 2 for b in batches)


def test_segdet_dataset(tmp_path):
    base = tmp_path
    os.makedirs(base / "coco" / "train2017")
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
        base / "coco" / "train2017" / "000001.jpg")
    ann = {"000001": {"cat": {"bboxes": [[5, 5, 20, 20], [30, 10, 50, 30]],
                              "cat_id": 7}}}
    json.dump(ann, open(base / "cocostuff_image2bboxes.json", "w"))
    os.makedirs(base / "cocostuff" / "train2017")
    sem = np.full((40, 60), 255, np.uint8)
    sem[5:20, 5:20] = 7
    Image.fromarray(sem).save(base / "cocostuff" / "train2017"
                              / "000001.png")

    from vstar_tpu.data.vsm_datasets import SegDetDataset
    ds = SegDetDataset(str(base), sources=("cocostuff",))
    rows = ds.sample_rows()
    assert len(rows) == 1
    r = rows[0]
    assert r.bboxes_valid and r.mask_valid
    assert r.tgt_boxes.shape == (2, 4)
    # normalized cxcywh of [5,5,20,20] in a 60x40 image
    np.testing.assert_allclose(r.tgt_boxes[0],
                               [12.5 / 60, 12.5 / 40, 15 / 60, 15 / 40],
                               rtol=1e-5)
    assert r.gt_mask.sum() == 15 * 15
    assert "please locate the cat" in r.source[0]["value"].lower()


def test_paco_annotation_builder(tmp_path):
    """Builder keys: verbatim relative file_name (images resolve under
    coco2017/, general_segdet_dataset.py:193-194) and canonical
    'obj'/'obj:part' class keys (the per-sample phrasing coin flip
    happens in SegDetDataset, not at preprocessing time)."""
    from vstar_tpu.data.preprocess_annotations import build_image2bboxes_paco
    data = {"categories": [
                {"id": 1, "name": "mug_(cup)"},
                {"id": 2, "name": "mug_(cup):handle_(grip)"}],
            "images": [{"id": 5, "file_name": "train2017/a.jpg"}],
            "annotations": [
                {"id": 1, "image_id": 5, "category_id": 1,
                 "bbox": [1, 2, 10, 10]},
                {"id": 2, "image_id": 5, "category_id": 2,
                 "bbox": [3, 4, 2, 2]}]}
    src = tmp_path / "paco.json"
    json.dump(data, open(src, "w"))
    out = build_image2bboxes_paco(str(src), str(tmp_path / "out.json"))
    entry = out["train2017/a.jpg"]
    assert "mug" in entry and "mug:handle" in entry
    assert entry["mug:handle"]["bboxes"] == [[3, 4, 5, 6]]


def test_paco_name_rendering():
    """render_paco_name: reference coin flip between 'obj part' and
    'the part of the obj', underscores -> spaces
    (general_segdet_dataset.py:221-231)."""
    import random

    from vstar_tpu.data.preprocess_annotations import render_paco_name
    rng = random.Random(0)
    seen = {render_paco_name("coffee_mug:side_handle", rng)
            for _ in range(50)}
    assert seen == {"coffee mug side handle",
                    "the side handle of the coffee mug"}
    assert render_paco_name("coffee_mug", rng) == "coffee mug"


def test_paco_segdet_end_to_end(tmp_path):
    """A paco source routes images under coco2017/<file_name>, renders
    part names per sample, and its rows collate + train one VSM step
    (the r3 routing defect sent paco to object365/ and was never
    exercised end-to-end)."""
    import jax
    import jax.numpy as jnp

    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.data.preprocess_annotations import build_image2bboxes_paco
    from vstar_tpu.data.vsm_datasets import SegDetDataset
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.train.lora import add_lora, vsm_trainable_mask
    from vstar_tpu.train.vsm_train import (VSMTrainState, make_vsm_optimizer,
                                           vsm_train_step)

    base = tmp_path
    os.makedirs(base / "coco2017" / "train2017")
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
        base / "coco2017" / "train2017" / "000009.jpg")
    data = {"categories": [{"id": 2, "name": "mug_(cup):handle_(grip)"}],
            "images": [{"id": 5, "file_name": "train2017/000009.jpg"}],
            "annotations": [{"id": 2, "image_id": 5, "category_id": 2,
                             "bbox": [3, 4, 12, 8]}]}
    src = tmp_path / "paco_lvis_v1_train.json"
    json.dump(data, open(src, "w"))
    build_image2bboxes_paco(str(src),
                            str(base / "paco_image2bboxes.json"))

    cfg = vsm_tiny()
    ds = SegDetDataset(str(base), sources=("paco",),
                       clip_size=cfg.vision.image_size,
                       owl_size=cfg.owl_vision.image_size, seed=0)
    rows = ds.sample_rows()
    assert len(rows) == 1
    r = rows[0]
    q = r.source[0]["value"].lower()
    assert ("mug handle" in q) or ("handle of the mug" in q), q
    assert r.bboxes_valid and not r.mask_valid   # boxes only, no sem mask
    np.testing.assert_allclose(r.tgt_boxes[0],
                               [9 / 60, 8 / 40, 12 / 60, 8 / 40], rtol=1e-5)

    tok = WordTokenizer()
    mask_res = cfg.sam.image_embedding_size[0] * 4
    batch = collate_vsm_rows(rows, tok, loc_token_id=3,
                             n_image_tokens=cfg.image_tokens,
                             seq_bucket=64, t_max=4, mask_res=mask_res)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_vsm_params(jax.random.PRNGKey(0), cfg)
    params["llama"] = add_lora(params["llama"], jax.random.PRNGKey(1),
                               r=2, alpha=4)
    opt = make_vsm_optimizer(lr=1e-3, warmup_steps=0, total_steps=10)
    state = VSMTrainState(params, opt.init(params),
                          jnp.zeros((), jnp.int32))
    _, metrics = jax.jit(
        lambda st, b: vsm_train_step(st, b, cfg, opt,
                                     vsm_trainable_mask(params),
                                     compute_dtype=jnp.float32))(
        state, batch)
    assert np.isfinite(float(metrics["loss"]))
