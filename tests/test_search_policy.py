"""Search-policy tests with a scripted VSM oracle (SURVEY.md §4b).

The oracle hides a target box in a synthetic image; detection confidence
only rises once the patch is zoomed enough, and the heatmap is a gaussian
bump at the target, so the test verifies guided descent, acceptance,
ancestor scoring, and the low-confidence fallback — without any model.
"""

import numpy as np
from PIL import Image

from vstar_tpu.search.policy import (get_sub_patches, get_subpatch_scores,
                                     iou_xywh, normalize_score,
                                     split_4subpatches, visual_search)

W = H = 896
TARGET = [700, 650, 60, 50]  # x, y, w, h


def _gauss_heatmap(patch_box, amp=10.0, sigma=60.0):
    x0, y0, w, h = patch_box
    ys, xs = np.mgrid[0:h, 0:w]
    cx = TARGET[0] + TARGET[2] / 2 - x0
    cy = TARGET[1] + TARGET[3] / 2 - y0
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    return amp * np.exp(-d2 / (2 * sigma ** 2)).astype(np.float32)


class OracleVSM:
    """Scripted model: confident only when the target covers >=1% of the
    patch and is fully inside it."""

    def __init__(self, max_logit=0.9):
        self.max_logit = max_logit
        self.detect_calls = []

    def _target_in(self, box):
        x0, y0, w, h = box
        return (TARGET[0] >= x0 and TARGET[1] >= y0
                and TARGET[0] + TARGET[2] <= x0 + w
                and TARGET[1] + TARGET[3] <= y0 + h)

    def detect(self, patch, name):
        box = getattr(patch, "_box")
        self.detect_calls.append(tuple(box))
        w, h = patch.size
        boxes = np.zeros((16, 4), np.float32)
        logits = np.full(16, 0.01, np.float32)
        if self._target_in(box):
            cx = (TARGET[0] + TARGET[2] / 2 - box[0]) / w
            cy = (TARGET[1] + TARGET[3] / 2 - box[1]) / h
            boxes[0] = [cx, cy, TARGET[2] / w, TARGET[3] / h]
            frac = (TARGET[2] * TARGET[3]) / (w * h)
            logits[0] = self.max_logit if frac > 0.01 else 0.2
        return boxes, logits, _gauss_heatmap(box)

    def vqa(self, patch, question):
        return ("The object is most likely to appear on the wooden table "
                "in the corner.")

    def segment(self, patch, phrase):
        return _gauss_heatmap(getattr(patch, "_box"), amp=1.0)


class FakeImage:
    """PIL-like image that hands crops their absolute box (so the oracle
    can reason in global coordinates). Delegates save/copy to a real PIL
    image so visualization works on it too."""

    def __init__(self, w=W, h=H):
        self.width, self.height = w, h
        self._img = Image.new("RGB", (w, h))

    def crop(self, ltrb):
        l, t, r, b = ltrb
        img = Image.new("RGB", (int(r - l), int(b - t)))
        img._box = [int(l), int(t), int(r - l), int(b - t)]
        return img

    def save(self, path):
        self._img.save(path)

    def copy(self):
        return self._img.copy()


def test_geometry_helpers():
    assert split_4subpatches([0, 0, 100, 250]) == (1, 4)
    assert split_4subpatches([0, 0, 250, 100]) == (4, 1)
    assert split_4subpatches([0, 0, 100, 120]) == (2, 2)
    subs, ws, hs = get_sub_patches([10, 20, 101, 50], 2, 2)
    assert ws == 50 and hs == 25
    # last patch absorbs the remainder
    assert subs[0] == [10, 20, 50, 25]
    assert subs[1] == [60, 20, 51, 25]
    assert subs[3] == [60, 45, 51, 25]
    # scores: mass proportional split, normalized to 1 over subpatches
    hm = np.zeros((50, 101), np.float32)
    hm[:25, :50] = 1.0
    scores = get_subpatch_scores(hm, [10, 20, 101, 50], subs)
    assert abs(scores[0] - 1.0) < 1e-6 and abs(sum(scores) - 1.0) < 1e-6
    assert normalize_score(np.zeros((4, 4))).max() == 0


def test_guided_search_finds_target():
    vsm = OracleVSM()
    img = FakeImage()
    final, plen, ok, valid = visual_search(vsm, img, "needle",
                                           smallest_size=224)
    assert ok and final.detection_result is not None
    found = final.detection_result.copy()
    found[0] += final.bbox[0]
    found[1] += final.bbox[1]
    assert iou_xywh(found, TARGET) > 0.5
    assert plen >= 2  # required zooming
    # guided: the second visited patch (first child) must contain the target
    assert vsm.detect_calls[1][0] <= TARGET[0] and \
        vsm.detect_calls[1][1] <= TARGET[1]


def test_low_confidence_fallback():
    vsm = OracleVSM(max_logit=0.4)  # never exceeds confidence_high
    img = FakeImage()
    final, plen, ok, valid = visual_search(vsm, img, "needle",
                                           smallest_size=224)
    assert ok  # 0.4 >= confidence_low 0.3
    assert final.temp_detection_result is not None
    assert final.detection_result is not None
    assert plen >= 1


def test_total_failure():
    class BlindVSM(OracleVSM):
        def detect(self, patch, name):
            boxes, logits, hm = super().detect(patch, name)
            logits[:] = 0.01
            return boxes, logits, hm

    final, plen, ok, valid = visual_search(BlindVSM(), FakeImage(),
                                           "needle", smallest_size=224)
    # every patch stashes a 0.01-logit temp detection; the best is kept as
    # final_step but success stays False (0.01 < confidence_low)
    assert not ok and plen == 1 and final is not None


def test_root_multi_instance():
    class EasyVSM(OracleVSM):
        def detect(self, patch, name):
            boxes, logits, hm = super().detect(patch, name)
            if getattr(patch, "_box")[2] == W:  # root patch: two instances
                boxes[0] = [0.2, 0.2, 0.1, 0.1]
                boxes[1] = [0.7, 0.7, 0.1, 0.1]
                logits[0] = logits[1] = 0.8
            return boxes, logits, hm

    final, plen, ok, valid = visual_search(EasyVSM(), FakeImage(),
                                           "needle", smallest_size=224)
    assert ok and plen == 1
    assert valid is not None and valid.shape == (2, 4)
    # returned in [x, y, w, h] pixels
    np.testing.assert_allclose(valid[0], [0.15 * W, 0.15 * H, 0.1 * W,
                                          0.1 * H], rtol=1e-5)
