"""Visualization + profiling util tests."""

import os

import numpy as np
from PIL import Image

from vstar_tpu.search.policy import SearchStep
from vstar_tpu.search.visualize import (draw_bbox, heatmap_overlay,
                                        visualize_search_path)
from vstar_tpu.utils.profiling import PhaseTimer


def test_draw_and_overlay():
    img = Image.fromarray(np.zeros((60, 80, 3), np.uint8))
    out = draw_bbox(img, [10, 10, 30, 20], "cat")
    arr = np.asarray(out)
    assert (arr[:, :, 0] == 255).any()  # red box drawn
    hm = np.zeros((60, 80), np.float32)
    hm[20:30, 20:30] = 5.0
    ov = heatmap_overlay(img, hm)
    assert ov.size == img.size
    assert np.asarray(ov).sum() > 0


def test_visualize_search_path(tmp_path):
    img = Image.fromarray(np.zeros((100, 120, 3), np.uint8))
    steps = [
        SearchStep(bbox=[0, 0, 120, 100], scale_level=1, score=None,
                   parent_index=-1,
                   final_heatmap=np.random.rand(100, 120).astype(np.float32),
                   context_cue="answer#phrase"),
        SearchStep(bbox=[0, 0, 60, 50], scale_level=2, score=0.5,
                   parent_index=0,
                   detection_result=np.asarray([5, 5, 20, 15], np.float32)),
    ]
    visualize_search_path(img, steps, 2, [10, 10, 20, 20], "cat",
                          str(tmp_path / "vis"))
    files = set(os.listdir(tmp_path / "vis"))
    assert {"whole_image.jpg", "step_1.jpg", "step_2.jpg",
            "step_1_heatmap.jpg", "search_result.jpg",
            "final_patch_image.jpg", "context_cue.txt"} <= files
    assert "step1: answer#phrase" in open(tmp_path / "vis"
                                          / "context_cue.txt").read()


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert set(s) == {"a", "b"} and t.counts["a"] == 2
    assert "a" in t.report()


def test_visual_search_visualization_flag(tmp_path):
    """visual_search(visualize=True) writes the reference's file set."""
    from tests.test_search_policy import FakeImage, OracleVSM, TARGET
    from vstar_tpu.search.policy import visual_search
    final, plen, ok, _ = visual_search(
        OracleVSM(), FakeImage(), "needle", target_bbox=TARGET,
        smallest_size=224, visualize=True,
        save_path=str(tmp_path / "vis"))
    assert ok
    files = set(os.listdir(tmp_path / "vis"))
    assert "whole_image.jpg" in files
    assert "search_result.jpg" in files
    assert any(f.startswith("step_") for f in files)
