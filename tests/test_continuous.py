"""Continuous-batching serving tests: wave formation, serial equivalence,
and the reference app.py failed-object semantics."""

import threading
import time

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


# -- pipeline=True (three-thread stage overlap) ---------------------------


class StageLogVQA(RecordingVQA):
    """Logs stage entries ('trigger'/'finish') and optionally blocks each
    free_form_many call on a gate so tests control interleaving."""

    def __init__(self, gate=None):
        super().__init__()
        self.stages = []
        self.gate = gate
        self._lock = threading.Lock()

    def free_form_many(self, images, questions, **kw):
        with self._lock:
            self.stages.append("trigger")
        if self.gate is not None:
            assert self.gate.wait(timeout=10), "test gate never released"
        return super().free_form_many(images, questions, **kw)

    def multiple_choice_many(self, images, questions, options_list, **kw):
        with self._lock:
            self.stages.append("finish")
        return super().multiple_choice_many(images, questions,
                                            options_list, **kw)


class GateVSM(BatchedStubVSM):
    """Blocks every detect_many wave on a gate (the search stage)."""

    def __init__(self, gate):
        self.gate = gate
        self.entered = threading.Event()

    def detect_many(self, patches, names):
        self.entered.set()
        assert self.gate.wait(timeout=10), "test gate never released"
        return super().detect_many(patches, names)


def _submit(svc, results, key, options=None):
    def go():
        try:
            results[key] = _strip_latency(
                svc.answer(_img(), "what color is it?", options))
        except BaseException as e:
            results[key] = e
    t = threading.Thread(target=go)
    t.start()
    return t


def test_pipeline_records_match_nonpipeline(engines):
    vqa, vsm = engines
    base = ContinuousSealService(StubVQAWithMany(), BatchedStubVSM(),
                                 max_batch=8, window_ms=60.0)
    pipe = ContinuousSealService(vqa, vsm, max_batch=8, window_ms=60.0,
                                 pipeline=True)
    try:
        want_ff = _strip_latency(base.answer(_img(), "what color is it?"))
        want_mc = _strip_latency(
            base.answer(_img(), "what color is it?", ["red", "blue"]))
        results = {}
        threads = [_submit(pipe, results, f"ff{i}") for i in range(3)]
        threads += [_submit(pipe, results, f"mc{i}", ["red", "blue"])
                    for i in range(3)]
        for t in threads:
            t.join(timeout=30)
        for i in range(3):
            assert results[f"ff{i}"] == want_ff
            assert results[f"mc{i}"] == want_mc
    finally:
        base.close()
        pipe.close()


class StubVQAWithMany(StubVQA):
    def free_form_many(self, images, questions, **kw):
        return [self.free_form(im, q) for im, q in zip(images, questions)]

    def multiple_choice_many(self, images, questions, options_list, **kw):
        return [1] * len(images)


def test_pipeline_overlaps_trigger_with_search():
    """Wave B's trigger (VQA worker) must run while wave A's search (VSM
    worker) is still in flight — the point of the mode."""
    search_gate = threading.Event()
    vqa = StageLogVQA()
    vsm = GateVSM(search_gate)
    svc = ContinuousSealService(vqa, vsm, max_batch=1, window_ms=1.0,
                                pipeline=True)
    results = {}
    try:
        ta = _submit(svc, results, "a", ["red", "blue"])
        assert vsm.entered.wait(timeout=10)      # A inside search, blocked
        tb = _submit(svc, results, "b", ["red", "blue"])
        deadline = time.monotonic() + 10
        while vqa.stages.count("trigger") < 2:   # B's trigger overlaps
            assert time.monotonic() < deadline, \
                f"no overlap: stages={vqa.stages}"
            time.sleep(0.005)
        assert not search_gate.is_set()          # A's search still blocked
        search_gate.set()
        ta.join(timeout=15)
        tb.join(timeout=15)
        assert results["a"]["option_chosen"] == 1
        assert results["b"]["option_chosen"] == 1
    finally:
        search_gate.set()
        svc.close()


def test_pipeline_finish_drains_before_trigger():
    """When a finished search and a fresh admission are both queued for
    the VQA worker, the finish stage must run first (completed requests
    never queue behind new arrivals — serve/continuous.py:241-254)."""
    search_gate = threading.Event()
    vqa_gate = threading.Event()
    vqa = StageLogVQA()          # gated per-call below
    vsm = GateVSM(search_gate)
    svc = ContinuousSealService(vqa, vsm, max_batch=1, window_ms=1.0,
                                pipeline=True)
    results = {}
    try:
        # A: trigger free, search blocked
        ta = _submit(svc, results, "a", ["red", "blue"])
        assert vsm.entered.wait(timeout=10)
        # B: gate ITS trigger so the VQA worker is held busy
        vqa.gate = vqa_gate
        tb = _submit(svc, results, "b", ["red", "blue"])
        deadline = time.monotonic() + 10
        while vqa.stages.count("trigger") < 2:   # B's trigger entered
            assert time.monotonic() < deadline
            time.sleep(0.005)
        # C: parks in _trigger_q while the worker is busy with B
        tc = _submit(svc, results, "c", ["red", "blue"])
        # A's search completes -> finish(A) parks in _s_finish
        search_gate.set()
        deadline = time.monotonic() + 10
        while not svc._s_finish.qsize():
            assert time.monotonic() < deadline
            time.sleep(0.005)
        vqa.gate = None
        vqa_gate.set()                            # release B's trigger
        for t in (ta, tb, tc):
            t.join(timeout=15)
        # finish(A) must precede trigger(C)
        fin_a = vqa.stages.index("finish")
        trig_c = len(vqa.stages) - 1 - vqa.stages[::-1].index("trigger")
        assert fin_a < trig_c, f"finish queued behind trigger: {vqa.stages}"
        for k in ("a", "b", "c"):
            assert results[k]["option_chosen"] == 1, results[k]
    finally:
        search_gate.set()
        vqa_gate.set()
        svc.close()


def test_pipeline_stage_error_fails_only_its_wave():
    class BoomOnceVSM(BatchedStubVSM):
        def __init__(self):
            self.n = 0

        def detect_many(self, patches, names):
            self.n += 1
            if self.n == 1:
                raise RuntimeError("search boom")
            return super().detect_many(patches, names)

    svc = ContinuousSealService(StubVQAWithMany(), BoomOnceVSM(),
                                max_batch=1, window_ms=1.0, pipeline=True)
    try:
        with pytest.raises(RuntimeError, match="search boom"):
            svc.answer(_img(), "what color is it?", ["red", "blue"])
        rec = svc.answer(_img(), "what color is it?", ["red", "blue"])
        assert rec["option_chosen"] == 1   # service survived the wave
    finally:
        svc.close()


def test_pipeline_close_with_inflight_waves_fails_futures():
    """close() while waves sit in stage queues AND inside a stage: every
    caller gets an exception, none hang (ADVICE r4 medium — workers used
    to exit on the stop flag leaving parked waves' futures pending)."""
    search_gate = threading.Event()
    vqa = StageLogVQA()
    vsm = GateVSM(search_gate)
    svc = ContinuousSealService(vqa, vsm, max_batch=1, window_ms=1.0,
                                pipeline=True)
    results = {}
    threads = [_submit(svc, results, "a", ["red", "blue"])]
    assert vsm.entered.wait(timeout=10)          # A blocked inside search
    threads.append(_submit(svc, results, "b", ["red", "blue"]))
    deadline = time.monotonic() + 10
    while vqa.stages.count("trigger") < 2:       # B parked in _s_search
        assert time.monotonic() < deadline
        time.sleep(0.005)

    closer = threading.Thread(target=svc.close)
    closer.start()
    time.sleep(0.05)
    search_gate.set()                            # unblock A's stage
    closer.join(timeout=20)
    assert not closer.is_alive(), "close() hung"
    for t in threads:
        t.join(timeout=15)
        assert not t.is_alive(), "caller hung after close"
    for k in ("a", "b"):
        assert isinstance(results[k], RuntimeError), results[k]


class OOMAboveTwoVQA(RecordingVQA):
    """Fakes device HBM exhaustion for trigger waves larger than 2 — the
    shape of the r5 measured failure (the mixed pair OOMs a max_batch=8
    free-form wave after smaller buckets filled the chip)."""

    def __init__(self):
        super().__init__()
        self.wave_sizes = []

    def free_form_many(self, images, questions, **kw):
        self.wave_sizes.append(len(images))
        if len(images) > 2:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")
        return super().free_form_many(images, questions, **kw)


@pytest.mark.parametrize("pipeline", [False, True])
def test_oom_wave_splits_instead_of_failing(pipeline):
    """A wave that exhausts HBM is halved and retried, transparently to
    callers: all requests complete with records identical to a serial
    service, and stats() counts the splits."""
    serial = SealService(StubVQA(), StubVSM())
    img = _img()
    want = _strip_latency(serial.answer(img, "what color is it?",
                                        ["red", "blue"]))

    svc = ContinuousSealService(OOMAboveTwoVQA(), BatchedStubVSM(),
                                max_batch=8, window_ms=150.0,
                                pipeline=pipeline)
    try:
        results = {}

        def go(k):
            results[k] = _strip_latency(
                svc.answer(_img(), "what color is it?", ["red", "blue"]))

        threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
            assert not t.is_alive()
        for i in range(6):
            assert results[i] == want
        assert svc.stats()["oom_splits"] >= 1
        assert max(svc.vqa.wave_sizes) > 2      # an oversized wave formed
        assert svc.vqa.wave_sizes[-1] <= 2      # ...and finished split
    finally:
        svc.close()


def test_oom_single_request_is_a_real_error(engines):
    """Splitting bottoms out at one request: its OOM propagates to the
    caller (a chip that can't fit batch-1 is not a retryable state), and
    the service survives for the next wave."""
    _, vsm = engines

    class AlwaysOOMVQA(RecordingVQA):
        def __init__(self):
            super().__init__()
            self.n = 0

        def free_form_many(self, images, questions, **kw):
            self.n += 1
            if self.n == 1:   # the 1-request wave: nothing to split
                raise RuntimeError("RESOURCE_EXHAUSTED: out of HBM")
            return super().free_form_many(images, questions, **kw)

    svc = ContinuousSealService(AlwaysOOMVQA(), vsm, max_batch=4,
                                window_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            svc.answer(_img(), "q?")
        rec = svc.answer(_img(), "q?")
        assert "answer" in rec
    finally:
        svc.close()


def test_split_on_oom_slices_parallel_columns(engines):
    """The splitter must slice every per-row column in lockstep with the
    wave (a misaligned merge would silently pair rows with the wrong
    inputs — worse than the OOM)."""
    vqa, vsm = engines
    svc = ContinuousSealService(vqa, vsm, max_batch=1, window_ms=1.0)
    try:
        calls = []

        def stage(reqs, colA, colB):
            calls.append((list(reqs), list(colA), list(colB)))
            if len(reqs) > 1:
                raise RuntimeError("RESOURCE_EXHAUSTED")
            return ([r * 10 for r in reqs], [a + b for a, b in
                                             zip(colA, colB)])

        out = svc._split_on_oom(stage, [1, 2, 3], [10, 20, 30],
                                [100, 200, 300])
        assert out == ([10, 20, 30], [110, 220, 330])
        # non-OOM errors pass through untouched
        def boom(reqs):
            raise ValueError("not an oom")
        with pytest.raises(ValueError):
            svc._split_on_oom(boom, [1, 2])
    finally:
        svc.close()


def test_oom_caps_future_wave_admission():
    """Bounded-wave admission: after an OOM split, the service forms
    future waves at the size that fit (no repeated failed dispatches),
    and 32 clean waves regrow the cap one doubling."""
    vqa = OOMAboveTwoVQA()
    svc = ContinuousSealService(vqa, BatchedStubVSM(), max_batch=8,
                                window_ms=150.0)
    try:
        results = {}

        def go(k):
            results[k] = svc.answer(_img(), "q?", ["red", "blue"])

        def burst(keys):
            ts = [threading.Thread(target=go, args=(k,)) for k in keys]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=30)
                assert not t.is_alive()

        burst(range(6))                      # wave of 6 OOMs -> cap
        assert svc.stats()["wave_cap"] in (2, 3)
        splits_after_first = svc.stats()["oom_splits"]
        n0 = len(vqa.wave_sizes)
        burst(range(10, 16))                 # admitted at the cap
        sizes = vqa.wave_sizes[n0:]
        assert max(sizes) <= 3
        # at cap<=2 no stage ever raises again; a cap of 3 pays at most
        # one more split before settling at 2
        assert svc.stats()["oom_splits"] <= splits_after_first + 1
        assert svc.stats()["wave_cap"] == 2

        # regrowth needs 32 clean CAP-SIZED waves: sub-cap waves are no
        # evidence the cap fits (a size-1 trickle must never regrow a
        # cap that a burst just proved too big)
        for i in range(8):
            go(f"trickle{i}")
        assert svc.stats()["wave_cap"] == 2
        for i in range(32):                  # 32 clean size-2 waves: 2->4
            burst((f"regrow{i}a", f"regrow{i}b"))
        assert svc.stats()["wave_cap"] == 4
    finally:
        svc.close()


def test_service_bounds_engine_canvas_cache(monkeypatch):
    """Serving bounds the VSM engine's retained-canvas LRU to its wave
    size (fresh per-request images never hit across waves — stale
    canvases are pure HBM pressure; r5 measured OOM)."""
    class CapVSM(BatchedStubVSM):
        def __init__(self):
            super().__init__()
            self.cap = None

        def set_canvas_capacity(self, n):
            self.cap = n

    vsm = CapVSM()
    import vstar_tpu.utils.hw as hw
    monkeypatch.setattr(hw, "is_axon_relay", lambda: True)
    svc = ContinuousSealService(RecordingVQA(), vsm, max_batch=8,
                                window_ms=1.0)
    svc.close()
    assert vsm.cap == 9          # relay: one wave + one in-flight
    monkeypatch.setattr(hw, "is_axon_relay", lambda: False)
    svc = ContinuousSealService(RecordingVQA(), vsm, max_batch=8,
                                window_ms=1.0)
    svc.close()
    assert vsm.cap == 16         # local prefetch: two waves overlap


def test_engine_canvas_capacity_trims_immediately():
    from vstar_tpu.search.batched import BatchedVSMEngine
    eng = BatchedVSMEngine.__new__(BatchedVSMEngine)  # no params needed
    import collections, threading as _t
    eng._canvas_cache = collections.OrderedDict(
        (i, (None, None)) for i in range(12))
    eng._canvas_capacity = 16
    eng._canvas_lock = _t.Lock()
    eng.set_canvas_capacity(3)
    assert len(eng._canvas_cache) == 3
    assert list(eng._canvas_cache) == [9, 10, 11]   # LRU kept the newest
