"""Search-mechanism evaluator (eval/search_eval.py) over the synthetic
benchmark: the full CLI path — annotation parsing (V*Bench schema with a
box LIST per target), per-target searches, IoU scoring, visualization."""

import os

from vstar_tpu.eval.search_eval import evaluate_search
from vstar_tpu.eval.synthetic import (ScriptedColorVSM,
                                      make_synthetic_benchmark)


def test_evaluate_search_synthetic_top1(tmp_path):
    make_synthetic_benchmark(str(tmp_path), n_per_task=2, seed=2)
    top1, avg_len = evaluate_search(ScriptedColorVSM(), str(tmp_path))
    assert top1 == 1.0
    assert avg_len >= 2.0  # guided descent, never a 1-step whole-image hit


def test_evaluate_search_visualization_writes_files(tmp_path):
    make_synthetic_benchmark(str(tmp_path / "bench"), n_per_task=1, seed=4)
    out = tmp_path / "vis"
    top1, _ = evaluate_search(ScriptedColorVSM(), str(tmp_path / "bench"),
                              visualization=True, output_path=str(out))
    assert top1 == 1.0
    written = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert any(f.endswith(".png") or f.endswith(".jpg") for f in written), \
        written


def test_evaluate_search_detects_localization_regression(tmp_path):
    class ShiftedVSM(ScriptedColorVSM):
        def detect(self, patch, name):
            boxes, logits, heat = super().detect(patch, name)
            boxes = boxes.copy()
            boxes[:, 0] += 0.2
            return boxes, logits, heat

    make_synthetic_benchmark(str(tmp_path), n_per_task=2, seed=5)
    top1, _ = evaluate_search(ShiftedVSM(), str(tmp_path))
    assert top1 < 1.0


class BatchedScriptedVSM(ScriptedColorVSM):
    def detect_many(self, patches, names):
        return [self.detect(p, n) for p, n in zip(patches, names)]

    def vqa_many(self, patches, qs):
        return [self.vqa(p, q) for p, q in zip(patches, qs)]

    def segment_many(self, patches, phrases):
        return [self.segment(p, ph) for p, ph in zip(patches, phrases)]


def test_evaluate_search_batched_matches_serial(tmp_path):
    make_synthetic_benchmark(str(tmp_path), n_per_task=2, seed=6)
    serial = evaluate_search(ScriptedColorVSM(), str(tmp_path))
    batched = evaluate_search(BatchedScriptedVSM(), str(tmp_path),
                              image_batch=3)
    assert batched == serial == (1.0, serial[1])


def test_evaluate_search_batched_visualization(tmp_path):
    make_synthetic_benchmark(str(tmp_path / "b"), n_per_task=2, seed=7)
    out = tmp_path / "vis"
    top1, _ = evaluate_search(BatchedScriptedVSM(), str(tmp_path / "b"),
                              visualization=True, output_path=str(out),
                              image_batch=4)
    assert top1 == 1.0
    # one visualization directory per (image, target) task
    dirs = [d for d, _, fs in os.walk(out) if fs]
    assert len(dirs) >= 4
