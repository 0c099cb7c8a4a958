"""Fused production search (whole search in one device dispatch,
search/compiled.py fused_search) vs the host-policy path driving the SAME
device-preprocessing engine: identical trajectories and results on a tiny
random VSM. Both sides extract patches on device from one canvas and share
every VSM program, so agreement here validates the in-loop policy +
window-extraction wiring, not model numerics."""

import zlib

import jax
import numpy as np
import pytest
from PIL import Image

from vstar_tpu.core.config import vsm_tiny
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine, run_batched_searches
from vstar_tpu.search.compiled import CompiledVSMSearch

CFG = vsm_tiny()


class ToyTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [self.bos_token_id]
        for w in text.split():
            ids.append(3 + zlib.crc32(w.encode())
                       % (CFG.llama.vocab_size - 3))
        return self._Out(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids
                        if not (skip_special_tokens and i < 3))


def _make_engine(loc_id=None, **kw):
    import jax.numpy as jnp
    params = init_vsm_params(jax.random.PRNGKey(11), CFG)
    tok = ToyTokenizer()
    eng = BatchedVSMEngine(params, CFG, tok,
                           loc_token_id=0 if loc_id is None else loc_id,
                           eos_id=2, max_new_tokens=4,
                           prompt_buckets=(64, 128),
                           compute_dtype=jnp.float32,
                           device_preprocess=True,
                           speculative_template=None, **kw)
    if loc_id is None:
        # whatever token the random model emits first acts as [LOC]
        img = Image.fromarray((np.random.RandomState(0)
                               .rand(64, 64, 3) * 255).astype("uint8"))
        out, _ = eng._run_many([img], ["probe"])
        eng.loc_token_id = int(out.tokens[0, 0])
    return eng


@pytest.fixture(scope="module")
def engines():
    eng = _make_engine()
    return eng, CompiledVSMSearch(eng, P=16)


def _img(seed, h=360, w=460):
    return Image.fromarray((np.random.RandomState(seed)
                            .rand(h, w, 3) * 255).astype("uint8"))


@pytest.mark.parametrize("seed,small", [(0, 120), (3, 200)])
def test_fused_matches_host_policy(engines, seed, small):
    eng, comp = engines
    img = _img(seed)

    host = run_batched_searches(eng, [img], ["cat"], smallest_size=small,
                                max_steps=8)[0]
    comp_res = comp.search(img, "cat", smallest_size=small, max_steps=8)

    fh, plh, okh, vh = host
    fc, plc, okc, vc = comp_res
    assert okh == okc
    assert plh == plc
    if fh is None:
        assert fc is None
    else:
        assert fc.bbox == fh.bbox
        assert fc.scale_level == fh.scale_level
        if fh.detection_result is not None:
            np.testing.assert_allclose(np.asarray(fc.detection_result),
                                       np.asarray(fh.detection_result),
                                       rtol=1e-4, atol=1e-4)
    if vh is not None:
        np.testing.assert_allclose(np.asarray(vc), np.asarray(vh),
                                   rtol=1e-4, atol=1e-4)
    else:
        assert vc is None


def test_fused_trajectory_and_dispatch_count(engines):
    """The whole search — detect steps AND context-cue events (answer
    decode, segment, push) — runs inside the fused programs: the
    engine's per-wave generate must never be called (r4; only a segment
    phrase overflowing the search's token bucket may fall back)."""
    eng, comp = engines
    img = _img(7)
    calls = []
    orig = eng._run_many

    def spy(images, questions):
        calls.append(list(questions))
        return orig(images, questions)

    eng._run_many = spy
    try:
        path = []
        final, plen, ok, _ = comp.search(img, "cat", smallest_size=120,
                                         max_steps=8, path_out=path)
    finally:
        eng._run_many = orig
    assert calls == []
    # the random tiny VSM goes weak on most steps — the in-program ctx
    # path must actually have run (context cues recorded on the path)
    assert any(s.context_cue for s in path)
    assert len(path) == max(plen, 1) or not ok


def test_seg_phrase_overflow_falls_back(engines):
    """A context phrase too long for the search's shared token bucket is
    served as a host wave (any phrase length keeps working)."""
    eng, comp = engines
    img = _img(8)
    calls = []
    orig = eng._run_many

    def spy(images, questions):
        calls.append(list(questions))
        return orig(images, questions)

    long_phrase = "spot " * 40    # overflows the 64-token bucket
    eng._run_many = spy
    try:
        import unittest.mock as mock
        # `search` imports context_phrase from .policy at call time, so
        # patching the policy module covers it
        with mock.patch("vstar_tpu.search.policy.context_phrase",
                        return_value=long_phrase):
            comp.search(img, "cat", smallest_size=120, max_steps=8)
    finally:
        eng._run_many = orig
    assert len(calls) >= 1                       # the fallback wave ran
    assert all(long_phrase in q for qs in calls for q in qs)


def test_canvas_prefetch_equivalence(engines, monkeypatch):
    """prefetch_canvas uploads on a background thread; _canvas must pick
    up the in-flight result (no duplicate upload) and match a direct
    build bit-for-bit."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)  # gate off
    eng, _ = engines
    img = _img(11)
    eng.prefetch_canvas(img)
    dev = eng._canvas(img)
    direct = eng._canvas_build(img)
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(direct))
    assert eng._canvas(img) is dev          # LRU hit
    assert id(img) not in eng._canvas_inflight
    eng.prefetch_canvas(img)                # cached -> no new inflight
    assert id(img) not in eng._canvas_inflight


def test_canvas_prefetch_failure_falls_back(engines, monkeypatch):
    """A failed background build must clear its inflight marker and the
    consumer must fall back to a synchronous rebuild (not raise)."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)  # gate off
    eng, _ = engines
    img = _img(12)
    orig = eng._canvas_build
    calls = {"n": 0}

    def flaky(image):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transfer died")
        return orig(image)

    monkeypatch.setattr(eng, "_canvas_build", flaky)
    eng.prefetch_canvas(img)
    dev = eng._canvas(img)                  # sync rebuild succeeds
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(orig(img)))
    assert id(img) not in eng._canvas_inflight
    assert calls["n"] >= 2


def test_canvas_prefetch_relay_gate(engines, monkeypatch):
    """On the axon relay (detected by the PALLAS_AXON_POOL_IPS env marker
    — the relay DEVICE reports platform 'tpu', so a platform-string check
    silently never fires) prefetch_canvas must no-op: the relay
    serializes transfers FIFO, so a background upload queues ahead of
    foreground dispatches (measured 4.5x slower pipelined searches)."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    from vstar_tpu.utils.hw import is_axon_relay
    assert is_axon_relay()
    eng, _ = engines
    img = _img(13)
    eng.prefetch_canvas(img)
    assert id(img) not in eng._canvas_inflight
    assert id(img) not in eng._canvas_cache


def test_compiled_search_delegates_prefetch(engines, monkeypatch):
    """CompiledVSMSearch must forward prefetch_canvas to the wrapped
    engine — serve/continuous.py and eval/batched_bench.py discover the
    hook via getattr, so a missing delegation silently drops the
    admission-time upload overlap in --compiled mode."""
    from vstar_tpu.search.compiled import CompiledVSMSearch
    eng, _ = engines
    comp = CompiledVSMSearch(eng, P=4)
    seen = []
    monkeypatch.setattr(eng, "prefetch_canvas", seen.append)
    img = _img(14)
    comp.prefetch_canvas(img)
    assert seen == [img]


def test_grouped_dispatch_compiled(engines):
    """run_grouped_searches routes a CompiledVSMSearch engine through the
    fused path (with next-canvas prefetch) and matches the batched host
    path task-for-task."""
    from vstar_tpu.search.batched import run_grouped_searches

    eng, comp = engines
    imgs = [_img(21), _img(22)]
    tasks = [{"image": imgs[0], "name": "cat", "smallest": 150},
             {"image": imgs[1], "name": "dog", "smallest": 150}]
    outs_c = run_grouped_searches(comp, tasks, max_steps=4)
    outs_h = run_grouped_searches(eng, tasks, max_steps=4)
    for (fc, pc, okc, vc), (fh, ph, okh, vh) in zip(outs_c, outs_h):
        assert okc == okh and pc == ph
        if fh is not None:
            assert fc.bbox == fh.bbox
    import pytest as _pytest
    with _pytest.raises(ValueError, match="visualization"):
        run_grouped_searches(comp, tasks, visualize=True)


def test_search_many_matches_serial(engines):
    """Batched fused searches are independent: results must match the
    per-search compiled path (same policy, same windows; the VSM batch
    only shares weight reads)."""
    eng, comp = engines
    imgs = [_img(31), _img(32), _img(33)]
    names = ["cat", "dog", "cup"]
    smalls = [120, 150, 120]
    outs_b = comp.search_many(imgs, names, smalls, max_steps=6)
    assert len(outs_b) == 3
    for i in range(3):
        fs, ps, oks, vs = comp.search(imgs[i], names[i],
                                      smallest_size=smalls[i],
                                      max_steps=6)
        fb, pb, okb, vb = outs_b[i]
        assert okb == oks and pb == ps, (i, pb, ps)
        if fs is None:
            assert fb is None
            continue
        assert fb.bbox == fs.bbox and fb.scale_level == fs.scale_level
        if fs.detection_result is not None:
            np.testing.assert_allclose(np.asarray(fb.detection_result),
                                       np.asarray(fs.detection_result),
                                       rtol=1e-4, atol=1e-4)
        if vs is not None:
            np.testing.assert_allclose(np.asarray(vb), np.asarray(vs),
                                       rtol=1e-4, atol=1e-4)
        else:
            assert vb is None


def test_search_many_custom_batch_buckets(engines):
    """batch_buckets=(...,8): five searches pad to one B=8 fused program
    and still match the per-search compiled path row for row."""
    eng, _ = engines
    comp8 = CompiledVSMSearch(eng, P=16, batch_buckets=(1, 2, 4, 8))
    assert comp8.BATCH_BUCKETS == (1, 2, 4, 8)
    imgs = [_img(50 + i) for i in range(5)]
    names = ["cat", "dog", "cup", "hat", "box"]
    smalls = [120, 150, 120, 200, 150]
    outs = comp8.search_many(imgs, names, smalls, max_steps=5)
    assert len(outs) == 5
    for i in range(5):
        fs, ps, oks, _ = comp8.search(imgs[i], names[i],
                                      smallest_size=smalls[i],
                                      max_steps=5)
        fb, pb, okb, _ = outs[i]
        assert okb == oks and pb == ps, (i, pb, ps)
        if fs is None:
            assert fb is None
        else:
            assert fb.bbox == fs.bbox


def test_grouped_dispatch_mixed_buckets(engines):
    """Tasks whose images land in different canvas buckets must chunk
    correctly (one search_many call per bucket run) and still produce
    per-task results."""
    from vstar_tpu.search.batched import run_grouped_searches

    eng, comp = engines
    tasks = [
        {"image": _img(41, 360, 460), "name": "cat", "smallest": 150},
        {"image": _img(42, 360, 460), "name": "dog", "smallest": 150},
        {"image": _img(43, 600, 700), "name": "cup", "smallest": 200},
        {"image": _img(44, 360, 460), "name": "hat", "smallest": 150},
    ]
    outs = run_grouped_searches(comp, tasks, max_steps=4)
    assert all(o is not None for o in outs)
    for t, (f, plen, ok, _) in zip(tasks, outs):
        ref = comp.search(t["image"], t["name"],
                          smallest_size=t["smallest"], max_steps=4)
        assert (ref[2], ref[1]) == (ok, plen)
        if ref[0] is not None:
            assert f.bbox == ref[0].bbox


def test_seal_service_with_compiled_vsm(engines):
    """serve --compiled: the SEAL service's search phase routes through
    the fused engine (seal_answer -> run_grouped_searches -> compiled)."""
    from vstar_tpu.serve.server import SealService

    eng, comp = engines

    class TriggerVQA:
        def free_form(self, image, question, **kw):
            if "Additional visual" in question:
                return "it is red"
            return ("Sorry, I can not answer the question. Some visual "
                    "information about the following objects is missing "
                    "or unclear: tiny cup.")

        def get_object_crop(self, image, bbox, patch_scale):
            return np.zeros((28, 28, 3), np.float32)

    svc = SealService(TriggerVQA(), comp, minimum_size=150)
    rec = svc.answer(_img(51), "what color is the tiny cup?")
    assert rec["missing_objects"] == ["tiny cup"]
    assert "search_result" in rec and "answer" in rec


def test_warmup_compiled_smoke(engines):
    from vstar_tpu.search.compiled import warmup_compiled

    eng, comp = engines
    logs = []
    warmup_compiled(comp, canvas_sizes=((96, 128),),
                    batch_buckets=(1, 2), log=logs.append)
    assert len(logs) == 2


def test_compiled_search_grows_past_P(engines, caplog):
    """A production fused search that outgrows P continues after an
    on-device state growth and matches the UNBOUNDED host policy exactly
    (confidence_high=2 pins the no-accept regime so the path must run to
    queue exhaustion, well past P=2)."""
    import logging

    eng, _ = engines
    comp = CompiledVSMSearch(eng, P=2, grow_limit=64)
    img = _img(61)
    kw = dict(smallest_size=120, confidence_high=2.0, confidence_low=0.0)
    host = run_batched_searches(eng, [img], ["cat"], **kw)[0]
    with caplog.at_level(logging.INFO, "vstar_tpu.search.compiled"):
        res = comp.search(img, "cat", **kw)
    assert any("growing" in r.getMessage() for r in caplog.records)
    fh, ph, okh, vh = host
    fc, pc, okc, vc = res
    assert okc == okh and pc == ph
    assert ph > 2                                # genuinely outgrew P
    if fh is not None:
        assert fc.bbox == fh.bbox
        np.testing.assert_allclose(np.asarray(fc.detection_result),
                                   np.asarray(fh.detection_result),
                                   rtol=1e-4, atol=1e-4)


def test_search_many_reruns_capped_rows(engines, caplog):
    """Batched fused searches whose path outgrows the shared P re-run
    through the growable serial path and still match the host policy."""
    import logging

    eng, _ = engines
    comp = CompiledVSMSearch(eng, P=2, grow_limit=64)
    imgs = [_img(62), _img(63)]
    kw = dict(confidence_high=2.0, confidence_low=0.0)
    with caplog.at_level(logging.INFO, "vstar_tpu.search.compiled"):
        outs = comp.search_many(imgs, ["cat", "dog"], [120, 120], **kw)
    assert any("re-running serially" in r.getMessage()
               for r in caplog.records)
    for i in range(2):
        fh, ph, okh, _ = run_batched_searches(eng, [imgs[i]],
                                              [["cat", "dog"][i]],
                                              smallest_size=120, **kw)[0]
        fb, pb, okb, _ = outs[i]
        assert okb == okh and pb == ph
        if fh is not None:
            assert fb.bbox == fh.bbox
