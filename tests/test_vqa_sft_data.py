"""Search-instruction SFT dataset + collator tests (synthetic fixtures)."""

import json
import os

import numpy as np
from PIL import Image

from vstar_tpu.data.vqa_sft_dataset import (SearchInstructionDataset,
                                            collate_vqa_sft,
                                            rewrite_conversations)
from vstar_tpu.multimodal.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                            OBJECT_TOKEN_INDEX)
from tests.test_data import WordTokenizer

NL, NS = 4, 2  # tiny long/short


def test_rewrite_conversations_object_strings():
    src = [{"from": "human",
            "value": "<image>\nWhere is the cup <object> and plate "
                     "<object>?"},
           {"from": "gpt", "value": "On the table."}]
    out = rewrite_conversations(
        src, ["cup <object> at location [0.1,0.2,0.3,0.4]",
              "plate <object> at location [0.5,0.6,0.7,0.8]"])
    assert "cup <object> at location [0.1,0.2,0.3,0.4]" in out[0]["value"]
    assert "plate <object> at location" in out[0]["value"]
    assert out[0]["value"].count("<object>") == 2


def _fixture(tmp_path, with_search=True):
    imgdir = tmp_path / "images"
    os.makedirs(imgdir)
    Image.fromarray(np.zeros((50, 70, 3), np.uint8)).save(
        imgdir / "a.jpg")
    search_item = {
        "image": "a.jpg", "search": 1,
        "target_instances": [{"bbox": [10, 10, 20, 15], "name": "cup"}],
        "conversations": [
            {"from": "human", "value": "<image>\nwhere is cup <object> ?"},
            {"from": "gpt", "value": "left"}]}
    plain_item = {
        "image": "a.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\ndescribe"},
            {"from": "gpt", "value": "an image"}]}
    text_item = {
        "conversations": [
            {"from": "human", "value": "hello ?"},
            {"from": "gpt", "value": "hi"}]}
    json.dump([search_item] if with_search else [],
              open(tmp_path / "GQA_data.json", "w"))
    json.dump([plain_item, text_item],
              open(tmp_path / "llava_instruct_data.json", "w"))
    return SearchInstructionDataset(str(tmp_path), str(imgdir),
                                    image_size=28)


def test_search_dataset_crops_and_flags(tmp_path):
    ds = _fixture(tmp_path)
    assert len(ds) == 3
    by_search = {bool(ds[i]["is_search"]): ds[i] for i in range(len(ds))}
    s = by_search[True]
    # single object: image short, last object long (train_search.py:739-741)
    assert s["images_long"] is False
    assert s["objects_long"] == [False, False, True]
    # zero crops padded at the front; the real crop is the last slot
    assert np.abs(s["objects"][0]).sum() == 0
    assert np.abs(s["objects"][2]).sum() > 0
    assert "<object> at location [" in s["source"][0]["value"]

    p = by_search[False]
    assert p["images_long"] is True and p["objects_long"] == [False] * 3


def test_collate_pads_sentinels_and_masks(tmp_path):
    ds = _fixture(tmp_path)
    tok = WordTokenizer()
    instances = [ds[i] for i in range(3)]
    batch = collate_vqa_sft(instances, tok, n_long=NL, n_short=NS,
                            seq_bucket=128)
    B = 3
    assert batch["text_ids"].shape == (B, 128)
    slot = NL + NS
    for b, inst in enumerate(instances):
        # exactly one image slot and 3 object slots spliced per row
        slots = set((batch["feat_idx"][b][batch["is_feat"][b]]
                     // slot).tolist())
        assert slots == {0, 1, 2, 3}
        feat = batch["is_feat"][b]
        kv = batch["kv_valid"][b]
        if not inst["has_image"]:
            # dummy image slot masked off
            img_positions = feat & (batch["feat_idx"][b] // slot == 0)
            assert not kv[img_positions].any()
        if inst["is_search"]:
            # one real object (slot 3 = last) attended; slots 1,2 masked
            for s_id, expect in [(1, False), (2, False), (3, True)]:
                pos = feat & (batch["feat_idx"][b] // slot == s_id)
                assert kv[pos].any() == expect, (b, s_id)
        # everything beyond the row length is invalid
        assert not kv[batch["lens"][b]:].any()


def test_collate_single_object_uses_long_range(tmp_path):
    ds = _fixture(tmp_path)
    tok = WordTokenizer()
    s = [d for d in (ds[i] for i in range(3)) if d["is_search"]][0]
    batch = collate_vqa_sft([s], tok, n_long=NL, n_short=NS, seq_bucket=128)
    slot = NL + NS
    fi = batch["feat_idx"][0]
    feat = batch["is_feat"][0]
    # image short: slot-0 positions use offsets >= NL
    img_off = fi[feat & (fi // slot == 0)] % slot
    assert (img_off >= NL).all() and len(img_off) == NS
    # real object long: slot-3 positions use offsets < NL
    obj_off = fi[feat & (fi // slot == 3)] % slot
    assert (obj_off < NL).all() and len(obj_off) == NL
