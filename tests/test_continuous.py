"""Continuous-batching serving tests: wave formation, serial equivalence,
and the reference app.py failed-object semantics."""

import threading

import numpy as np
import pytest
from PIL import Image

from tests.test_batched_bench import BatchedStubVSM
from tests.test_serve import StubVQA, StubVSM
from vstar_tpu.serve.continuous import ContinuousSealService
from vstar_tpu.serve.server import SealService


def _img(w=600, h=500):
    return Image.fromarray(np.zeros((h, w, 3), np.uint8))


class RecordingVQA(StubVQA):
    """StubVQA with the batched interfaces + question logging."""

    def __init__(self):
        self.seen_questions = []

    def free_form(self, image, question, **kw):
        self.seen_questions.append(question)
        return super().free_form(image, question, **kw)

    def free_form_many(self, images, questions, **kw):
        return [self.free_form(im, q) for im, q in zip(images, questions)]

    def multiple_choice_many(self, images, questions, options_list, **kw):
        self.seen_questions.extend(questions)
        return [1] * len(images)


@pytest.fixture()
def engines():
    return RecordingVQA(), BatchedStubVSM()


def _strip_latency(rec):
    rec = dict(rec)
    rec.pop("latency_s", None)
    return rec


def test_continuous_matches_serial_service(engines):
    vqa, vsm = engines
    serial = SealService(StubVQA(), StubVSM())
    svc = ContinuousSealService(vqa, vsm, max_batch=8, window_ms=120.0)
    try:
        img = _img()
        want_ff = _strip_latency(serial.answer(img, "what color is it?"))
        want_mc = _strip_latency(
            serial.answer(img, "what color is it?", ["red", "blue"]))

        results = {}

        def go(key, options):
            results[key] = _strip_latency(
                svc.answer(_img(), "what color is it?", options))

        threads = [threading.Thread(target=go, args=("ff%d" % i, None))
                   for i in range(3)]
        threads += [threading.Thread(target=go, args=("mc%d" % i,
                                                      ["red", "blue"]))
                    for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)

        for i in range(3):
            assert results[f"ff{i}"] == want_ff
            assert results[f"mc{i}"] == want_mc
        st = svc.stats()
        assert st["requests"] == 6
        assert st["max_wave"] > 1, f"no co-batching happened: {st}"
    finally:
        svc.close()


def test_mixed_option_counts_group_separately(engines):
    vqa, vsm = engines
    svc = ContinuousSealService(vqa, vsm, max_batch=8, window_ms=120.0)
    try:
        results = {}

        def go(key, options):
            results[key] = svc.answer(_img(), "what color is it?", options)

        threads = [
            threading.Thread(target=go, args=("a", ["red", "blue"])),
            threading.Thread(target=go, args=("b", ["x", "y", "z"])),
            threading.Thread(target=go, args=("c", ["red", "blue"])),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r["option_chosen"] == 1 for r in results.values())
        assert results["b"]["options"] == ["x", "y", "z"]
    finally:
        svc.close()


class WeakStubVSM(StubVSM):
    """Detection never crosses confidence_high; the search ends on the
    <0.3 fallback: search unsuccessful but a weak box exists."""

    def detect(self, patch, name):
        boxes = np.zeros((4, 4), np.float32)
        boxes[0] = [0.5, 0.5, 0.25, 0.25]
        return boxes, np.asarray([0.2, 0, 0, 0], np.float32), \
            np.ones((patch.height, patch.width), np.float32)


def test_failed_object_keeps_weak_box_and_focus_clause():
    # Reference semantics (app.py:165-179): `search_successful=False` adds
    # the name to failed_objects AND the fallback detection still lands in
    # search_result; the focus message then carries the
    # 'not existent in the image' clause (app.py:215-223).
    vqa = RecordingVQA()
    svc = SealService(vqa, WeakStubVSM())
    rec = svc.answer(_img(120, 80), "what color is the tiny cup?")
    assert rec["failed_objects"] == ["tiny cup"]
    assert len(rec["search_result"]) == 1
    assert rec["answer"] == "it is red"
    focus_qs = [q for q in vqa.seen_questions if "Additional visual" in q]
    assert focus_qs and "tiny cup not existent in the image" in focus_qs[0]


def test_error_in_wave_propagates_and_service_survives(engines):
    _, vsm = engines

    class BoomVQA(RecordingVQA):
        def __init__(self):
            super().__init__()
            self.n = 0

        def free_form_many(self, images, questions, **kw):
            self.n += 1
            if self.n == 1:
                raise RuntimeError("boom")
            return super().free_form_many(images, questions, **kw)

    svc = ContinuousSealService(BoomVQA(), vsm, max_batch=4, window_ms=5.0)
    try:
        with pytest.raises(RuntimeError):
            svc.answer(_img(), "q?")
        rec = svc.answer(_img(), "q?")  # next wave works
        assert "answer" in rec
    finally:
        svc.close()


def test_close_fails_pending_instead_of_hanging(engines):
    import time

    class SlowVQA(RecordingVQA):
        def free_form_many(self, images, questions, **kw):
            time.sleep(0.3)
            return super().free_form_many(images, questions, **kw)

    vqa, vsm = SlowVQA(), engines[1]
    svc = ContinuousSealService(vqa, vsm, max_batch=2, window_ms=5.0)
    errs = []

    def go():
        try:
            svc.answer(_img(), "q?")
        except BaseException as e:
            errs.append(e)

    threads = [threading.Thread(target=go) for _ in range(4)]
    for t in threads:
        t.start()
    svc.close()
    for t in threads:
        t.join(timeout=15)
    assert not any(t.is_alive() for t in threads), "caller hung after close"
    # post-close submissions are rejected immediately
    with pytest.raises(RuntimeError):
        svc.answer(_img(), "q?")


class NoTriggerVQA(RecordingVQA):
    """Never emits the missing-objects trigger sentence (like random
    weights in the serving benchmark)."""

    def free_form(self, image, question, **kw):
        self.seen_questions.append(question)
        return "a perfectly ordinary answer"


def test_missing_parser_and_search_kwargs_force_search():
    """scripts/serve_seal_bench.py's hooks: missing_parser forces the
    search path when the trigger sentence never appears, and
    search_kwargs reach the policy (confidence_high=2.0 > sigmoid of any
    logit => the stub's 0.9-logit detection lands in the weak-fallback
    branch instead of accepting at the root)."""
    vqa = NoTriggerVQA()
    svc = ContinuousSealService(
        vqa, BatchedStubVSM(), max_batch=2, window_ms=5.0,
        missing_parser=lambda p: ["forced gadget"],
        search_kwargs=dict(confidence_high=2.0))
    try:
        rec = svc.answer(_img(), "what color is it?", ["red", "blue"])
        assert rec["missing_objects"] == ["forced gadget"]
        assert rec["search_result"], "forced search produced no boxes"
        # confidence_high=2.0 means no accept: weak fallback only
        names = [r["name"] for r in rec["search_result"]]
        assert names == ["forced gadget"]
    finally:
        svc.close()

    # default parser unchanged: the non-trigger answer finds nothing
    svc2 = ContinuousSealService(NoTriggerVQA(), BatchedStubVSM(),
                                 max_batch=2, window_ms=5.0)
    try:
        rec2 = svc2.answer(_img(), "what color is it?", ["red", "blue"])
        assert rec2["missing_objects"] == []
        assert rec2["search_result"] == []
    finally:
        svc2.close()
