"""Device-policy parity: `visual_search_device_policy` (queue, thresholds,
splits and ancestor scores as jitted transitions — search/compiled.py) must
traverse identically to the host policy under one scripted oracle, across
every control-flow regime. Reference-side parity of the same scenarios is
covered by test_ref_search_parity (parametrized over both policies)."""

import numpy as np
import pytest

from vstar_tpu.search.compiled import visual_search_device_policy
from vstar_tpu.search.policy import visual_search

from tests.test_ref_search_parity import (CoordImage, OurAdapter,
                                          ScriptedVSM)


SCENARIOS = {
    "root_accept": dict(target=[300, 280, 320, 300]),
    "target_cue": dict(target=[700, 650, 60, 50]),
    "context_cue": dict(target=[700, 650, 60, 50], heat_amp=2.0),
    "fallback_success": dict(target=[700, 650, 60, 50], max_logit=0.45),
    "fallback_failure": dict(target=[700, 650, 60, 50], max_logit=0.2),
}


def _run_pair(oracle_kw, size=(896, 896), **kw):
    o_host, o_dev = ScriptedVSM(**oracle_kw), ScriptedVSM(**oracle_kw)
    img = CoordImage(*size)
    host = visual_search(OurAdapter(o_host), img, "needle",
                         smallest_size=224, **kw)
    dev = visual_search_device_policy(OurAdapter(o_dev), img, "needle",
                                      smallest_size=224, **kw)
    return host, dev, o_host, o_dev


def _assert_same(host, dev, o_host, o_dev):
    assert o_host.detect_calls == o_dev.detect_calls
    assert o_host.vqa_calls == o_dev.vqa_calls
    assert o_host.segment_calls == o_dev.segment_calls
    fh, ph, okh, vh = host
    fd, pd, okd, vd = dev
    assert okh == okd and ph == pd
    if fh is None:
        assert fd is None
        return
    assert fd.bbox == fh.bbox and fd.scale_level == fh.scale_level
    if fh.detection_result is not None:
        np.testing.assert_allclose(np.asarray(fd.detection_result),
                                   np.asarray(fh.detection_result),
                                   rtol=1e-5, atol=1e-5)
    if vh is not None:
        np.testing.assert_allclose(np.asarray(vd), np.asarray(vh),
                                   rtol=1e-5, atol=1e-5)
    else:
        assert vd is None


@pytest.mark.parametrize("scenario", sorted(SCENARIOS))
def test_device_policy_matches_host(scenario):
    host, dev, o1, o2 = _run_pair(SCENARIOS[scenario])
    _assert_same(host, dev, o1, o2)


def test_device_policy_aspect_split():
    host, dev, o1, o2 = _run_pair(dict(target=[1500, 100, 60, 50],
                                       sigma=40.0), size=(1800, 400))
    _assert_same(host, dev, o1, o2)


def test_device_policy_max_steps():
    host, dev, o1, o2 = _run_pair(dict(target=[700, 650, 60, 50],
                                       max_logit=0.45), max_steps=3)
    _assert_same(host, dev, o1, o2)


def test_device_policy_path_record():
    """The fetched path mirrors the host policy's SearchStep list (bbox,
    level, parent, context cues) — the record eval/seal relies on."""
    o_host, o_dev = (ScriptedVSM(target=[700, 650, 60, 50], heat_amp=2.0)
                     for _ in range(2))
    img = CoordImage(896, 896)
    path_h, path_d = [], []
    visual_search(OurAdapter(o_host), img, "needle", smallest_size=224,
                  path_out=path_h)
    visual_search_device_policy(OurAdapter(o_dev), img, "needle",
                                smallest_size=224, path_out=path_d)
    assert len(path_h) == len(path_d)
    for sh, sd in zip(path_h, path_d):
        assert sh.bbox == sd.bbox
        assert sh.scale_level == sd.scale_level
        assert sh.parent_index == sd.parent_index
        assert (sh.context_cue is None) == (sd.context_cue is None)
        if sh.context_cue:
            assert sh.context_cue == sd.context_cue
        if sh.score is not None:
            assert sd.score == pytest.approx(sh.score, rel=1e-5, abs=1e-6)


def test_device_policy_grows_past_P(caplog):
    """A scene whose path outgrows the initial device capacity: the state
    doubles on device (grow_and_pop) and the traversal still matches the
    host policy, whose recursion is bounded only by patch size
    (visual_search.py:416-418) — no silent fallback at P."""
    import logging

    kw = dict(target=[700, 650, 60, 50], max_logit=0.45)
    o_host, o_dev = ScriptedVSM(**kw), ScriptedVSM(**kw)
    img = CoordImage(896, 896)
    host = visual_search(OurAdapter(o_host), img, "needle",
                         smallest_size=224)
    with caplog.at_level(logging.INFO, "vstar_tpu.search.compiled"):
        dev = visual_search_device_policy(OurAdapter(o_dev), img, "needle",
                                          smallest_size=224, P=4)
    assert len(o_host.detect_calls) > 4          # the scene outgrows P=4
    assert any("growing" in r.getMessage() for r in caplog.records)
    _assert_same(host, dev, o_host, o_dev)


def test_device_policy_grow_limit_warns(caplog):
    """When the grow limit itself binds, the capped ending is LOGGED (one
    line) and behaves like max_steps=grow_limit on the host policy."""
    import logging

    kw = dict(target=[700, 650, 60, 50], max_logit=0.45)
    o_host, o_dev = ScriptedVSM(**kw), ScriptedVSM(**kw)
    img = CoordImage(896, 896)
    host = visual_search(OurAdapter(o_host), img, "needle",
                         smallest_size=224, max_steps=4)
    with caplog.at_level(logging.WARNING, "vstar_tpu.search.compiled"):
        dev = visual_search_device_policy(OurAdapter(o_dev), img, "needle",
                                          smallest_size=224, P=4,
                                          grow_limit=4)
    assert any("grow-limit" in r.getMessage() for r in caplog.records)
    _assert_same(host, dev, o_host, o_dev)


def test_device_policy_user_max_steps_does_not_grow(caplog):
    """max_steps < P is the caller's cap: no growth, no log."""
    import logging

    with caplog.at_level(logging.INFO, "vstar_tpu.search.compiled"):
        host, dev, o1, o2 = _run_pair(dict(target=[700, 650, 60, 50],
                                           max_logit=0.45), max_steps=3)
    assert not any("capacity" in r.getMessage() for r in caplog.records)
    _assert_same(host, dev, o1, o2)
