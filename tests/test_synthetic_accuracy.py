"""End-to-end SEMANTIC accuracy gate over the synthetic V*Bench.

VERDICT r1 weak #7: the prior e2e test asserted only schema. Here the
scripted engines answer from the pixels they receive, so accuracy stays
1.0 only while every coordinate transform in the SEAL loop + search
policy is correct: patch cropping, detection-box de-normalization,
patch-local -> global -> expand2square -> normalized focus bboxes, and
crop extraction. Any flip/offset regression drops accuracy and fails.
"""

import numpy as np

from vstar_tpu.eval.seal import seal_answer
from vstar_tpu.eval.synthetic import (ScriptedColorVQA, ScriptedColorVSM,
                                      make_synthetic_benchmark,
                                      run_synthetic_eval)
from vstar_tpu.search.policy import iou_xywh


def test_full_seal_loop_accuracy_is_100(tmp_path):
    acc, per_task, path_lengths, results = run_synthetic_eval(
        str(tmp_path), n_per_task=3, seed=0)
    assert acc == 1.0, (acc, per_task, results)
    assert per_task["direct_attributes"] == 1.0
    assert per_task["relative_position"] == 1.0
    # guided search descends: whole image -> quadrant (at least)
    assert path_lengths and all(p >= 2 for p in path_lengths)
    assert max(path_lengths) <= 12


def test_search_box_iou_against_ground_truth(tmp_path):
    specs = make_synthetic_benchmark(str(tmp_path), n_per_task=2, seed=3)
    vqa = ScriptedColorVQA(specs)
    vsm = ScriptedColorVSM()
    from PIL import Image
    import os
    for s in specs:
        img = Image.open(os.path.join(
            str(tmp_path), s["task"], s["image"])).convert("RGB")
        vqa.set_sample(s["name"])
        rec = seal_answer(vqa, vsm, img,
                          "What is the color of the small marker?",
                          ["a", "b"])
        assert rec["search_result"], rec
        found = rec["search_result"][0]["bbox"]
        assert iou_xywh(found, s["bbox"]) > 0.5, (found, s["bbox"])


def test_coordinate_regression_is_caught(tmp_path):
    """The gate has teeth: a scripted VSM whose boxes are off by half a
    target drops accuracy below 1."""

    class ShiftedVSM(ScriptedColorVSM):
        def detect(self, patch, name):
            boxes, logits, heat = super().detect(patch, name)
            boxes = boxes.copy()
            boxes[:, 0] += 0.15  # systematic x-offset bug
            return boxes, logits, heat

    specs = make_synthetic_benchmark(str(tmp_path), n_per_task=2, seed=1)
    vqa = ScriptedColorVQA(specs)
    vsm = ShiftedVSM()
    from PIL import Image
    import os
    correct = []
    for s in specs:
        img = Image.open(os.path.join(
            str(tmp_path), s["task"], s["image"])).convert("RGB")
        vqa.set_sample(s["name"])
        rec = seal_answer(vqa, vsm, img,
                          "What is the color of the small marker?",
                          ["a", "b"])
        correct.append(rec["correct"])
    assert np.mean(correct) < 1.0
