"""Batched V*Bench driver test with stub engines + synthetic benchmark."""

import json
import os
import types

import numpy as np
from PIL import Image

from vstar_tpu.eval.batched_bench import eval_batch, eval_model_batched
from tests.test_serve import StubVQA, StubVSM


class BatchedStubVSM(StubVSM):
    def detect_many(self, patches, names):
        return [self.detect(p, n) for p, n in zip(patches, names)]

    def vqa_many(self, patches, qs):
        return [self.vqa(p, q) for p, q in zip(patches, qs)]

    def segment_many(self, patches, phrases):
        return [self.segment(p, ph) for p, ph in zip(patches, phrases)]


def _img(w=600, h=500):
    return Image.fromarray(np.zeros((h, w, 3), np.uint8))


def test_eval_batch_matches_serial_semantics():
    samples = [
        {"image": _img(), "question": "what color is the tiny cup?",
         "options": ["red", "blue", "x", "y"]},
        {"image": _img(640, 480), "question": "where is the tiny cup?",
         "options": ["left", "right", "up", "down"]},
    ]
    recs = eval_batch(StubVQA(), BatchedStubVSM(), samples)
    assert len(recs) == 2
    for rec in recs:
        assert rec["missing_objects"] == ["tiny cup"]
        assert len(rec["search_result"]) == 1
        assert rec["option_chosen"] == 1 and rec["correct"] == 0


def test_eval_model_batched_files(tmp_path):
    for tt in ("direct_attributes", "relative_position"):
        d = tmp_path / tt
        os.makedirs(d)
        for i in range(3):
            _img().save(d / f"s{i}.jpg")
            json.dump({"question": "what color is the tiny cup?",
                       "options": ["red", "blue", "c", "d"]},
                      open(d / f"s{i}.json", "w"))
    args = types.SimpleNamespace(
        benchmark_folder=str(tmp_path), minimum_size_scale=4.0,
        minimum_size=224, output_path=str(tmp_path / "out.json"))
    results = eval_model_batched(args, StubVQA(), BatchedStubVSM(),
                                 image_batch=2)
    assert len(results["direct_attributes"]) == 3
    assert len(results["relative_position"]) == 3
    out = json.load(open(tmp_path / "out.json"))
    assert set(out) == {"direct_attributes", "relative_position"}
    rec = out["direct_attributes"][0]
    assert {"question", "options", "image", "prediction_freeform",
            "missing_objects", "search_result", "option_chosen",
            "correct"} <= set(rec)
