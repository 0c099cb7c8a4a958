"""Phase-swapped single-chip evaluation (eval/phased.py): the re-ordered
loop — free-form over all images, ONE swap to the VSM, all searches, swap
back, all focus re-asks — must produce records IDENTICAL to eval_model's
per-sample serial loop, on tiny real models. Engine factories rebuild from
the same seeds, standing in for re-reading a checkpoint after a weight
swap."""

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vqa_llm_tiny, vsm_tiny
from vstar_tpu.eval.phased import eval_model_phased, free_engine
from vstar_tpu.eval.seal import MISSING_OBJECTS_MSG
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.eval.vstar_bench import eval_model
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine
from tests.test_data import WordTokenizer

VQA_CFG = vqa_llm_tiny()
VSM_CFG = vsm_tiny()


class TriggerVQA(VQAEngine):
    """Tiny real engine whose free-form phase always emits the trigger
    sentence (random weights never would), so the search + focus phases
    actually execute; option scoring is the real model."""

    TRIGGER = MISSING_OBJECTS_MSG + " tiny cup."

    def free_form(self, image, question, **kw):
        return self.TRIGGER

    def free_form_many(self, images, questions, **kw):
        return [self.TRIGGER] * len(images)


def _mk_benchmark(tmp_path, n_direct=2, n_rel=1):
    rng = np.random.RandomState(0)
    counts = {"direct_attributes": n_direct, "relative_position": n_rel}
    for tt, cnt in counts.items():
        d = tmp_path / tt
        os.makedirs(d)
        for i in range(cnt):
            Image.fromarray((rng.rand(250, 300, 3) * 255)
                            .astype("uint8")).save(d / f"s{i}.jpg")
            json.dump({"question": f"what color is cup {tt[:3]}{i}?",
                       "options": ["red", "blue"]},
                      open(d / f"s{i}.json", "w"))


def _vqa_factory():
    return TriggerVQA(
        init_vqa_llm_params(jax.random.PRNGKey(0), VQA_CFG), VQA_CFG,
        WordTokenizer(), prompt_buckets=(64, 128), option_bucket=16,
        compute_dtype=jnp.float32)


def _vsm_factory():
    tok = WordTokenizer()
    return BatchedVSMEngine(
        init_vsm_params(jax.random.PRNGKey(1), VSM_CFG), VSM_CFG, tok,
        loc_token_id=tok._word_id("[LOC]"), max_new_tokens=4,
        prompt_buckets=(64, 128), compute_dtype=jnp.float32,
        device_preprocess=True, speculative_template=None)


def test_phased_matches_serial(tmp_path):
    _mk_benchmark(tmp_path)

    results_p, per_type_p, timings = eval_model_phased(
        str(tmp_path), _vqa_factory, _vsm_factory,
        output_path=str(tmp_path / "phased.json"),
        minimum_size_scale=4.0, minimum_size=224, batch=2,
        log=None)

    args = types.SimpleNamespace(
        benchmark_folder=str(tmp_path),
        output_path=str(tmp_path / "serial.json"),
        minimum_size_scale=4.0, minimum_size=224, conv_type="v1")
    results_s, _, _ = eval_model(args, _vqa_factory(), _vsm_factory())

    for tt in ("direct_attributes", "relative_position"):
        assert len(results_p[tt]) == len(results_s[tt])
        for rp, rs in zip(results_p[tt], results_s[tt]):
            assert rp["image"] == rs["image"]
            assert rp["question"] == rs["question"]
            assert rp["prediction_freeform"] == rs["prediction_freeform"]
            assert rp["missing_objects"] == rs["missing_objects"]
            assert rp["option_chosen"] == rs["option_chosen"]
            assert len(rp["search_result"]) == len(rs["search_result"])
            for a, b in zip(rp["search_result"], rs["search_result"]):
                assert a["name"] == b["name"]
                np.testing.assert_allclose(a["bbox"], b["bbox"],
                                           rtol=1e-5, atol=1e-5)

    # timing contract: phases + swaps measured, throughput derived
    for k in ("phase1_s", "phase2_s", "phase3_s", "swap_total_s",
              "images_per_s_steady", "images_per_s_amortized"):
        assert k in timings and timings[k] >= 0
    assert timings["n_images"] == 3 and timings["n_searches"] == 3
    assert json.load(open(tmp_path / "phased.json")).keys() \
        == json.load(open(tmp_path / "serial.json")).keys()


def test_coresident_matches_swapped(tmp_path):
    """coresident=True (both engines resident, no swaps — the int4-pair
    mode) must produce records identical to the swap path, with zero swap
    time and amortized == steady throughput."""
    _mk_benchmark(tmp_path)
    results_s, _, t_swap = eval_model_phased(
        str(tmp_path), _vqa_factory, _vsm_factory,
        minimum_size_scale=4.0, minimum_size=224, batch=2, log=None)
    calls = {"vqa": 0, "vsm": 0}

    def vqa_once():
        calls["vqa"] += 1
        return _vqa_factory()

    def vsm_once():
        calls["vsm"] += 1
        return _vsm_factory()

    results_c, _, t_co = eval_model_phased(
        str(tmp_path), vqa_once, vsm_once,
        minimum_size_scale=4.0, minimum_size=224, batch=2,
        coresident=True, log=None)
    assert calls == {"vqa": 1, "vsm": 1}          # no reloads
    assert t_co["swap_total_s"] == 0.0
    assert (t_co["images_per_s_steady"]
            == t_co["images_per_s_amortized"])
    for tt in ("direct_attributes", "relative_position"):
        for rc, rs in zip(results_c[tt], results_s[tt]):
            assert rc["option_chosen"] == rs["option_chosen"]
            assert rc["missing_objects"] == rs["missing_objects"]
            for a, b in zip(rc["search_result"], rs["search_result"]):
                np.testing.assert_allclose(a["bbox"], b["bbox"],
                                           rtol=1e-5, atol=1e-5)


def test_phased_cli_flag(tmp_path, monkeypatch):
    """--single-chip-phased routes eval_model through the phased runner:
    the engine factories are built from the checkpoint-loading functions
    (monkeypatched to the tiny engines here) and the result JSON lands in
    the reference schema."""
    import pytest

    import vstar_tpu.eval.vstar_bench as vb
    args = vb.build_parser().parse_args(["--single-chip-phased"])
    assert args.single_chip_phased
    args.mesh = "1x2x1"
    with pytest.raises(AssertionError, match="single-chip"):
        eval_model(args)
    args.mesh = None

    _mk_benchmark(tmp_path, n_direct=1, n_rel=1)
    monkeypatch.setattr(vb, "load_vqa_engine",
                        lambda *a, **k: _vqa_factory())
    monkeypatch.setattr(vb, "load_vsm_engine",
                        lambda *a, **k: _vsm_factory())
    args.benchmark_folder = str(tmp_path)
    args.output_path = str(tmp_path / "out.json")
    results, per_type, timings = eval_model(args)
    out = json.load(open(tmp_path / "out.json"))
    assert len(out["direct_attributes"]) == 1
    assert out["direct_attributes"][0]["missing_objects"] == ["tiny cup"]
    assert timings["n_images"] == 2

    # an explicit --image-batch must be honored, not silently clamped up
    # (small waves are the documented HBM-pressure mitigation)
    import vstar_tpu.eval.phased as ph
    seen = {}
    real_phased = ph.eval_model_phased

    def spy(*a, **kw):
        seen["batch"] = kw.get("batch")
        return real_phased(*a, **kw)

    # eval_model does `from .phased import eval_model_phased` at call
    # time, so patching the source module intercepts it
    monkeypatch.setattr(ph, "eval_model_phased", spy)
    args2 = vb.build_parser().parse_args(
        ["--single-chip-phased", "--image-batch", "1"])
    args2.benchmark_folder = str(tmp_path)
    args2.output_path = str(tmp_path / "out2.json")
    eval_model(args2)
    assert seen["batch"] == 1
    args3 = vb.build_parser().parse_args(["--single-chip-phased"])
    args3.benchmark_folder = str(tmp_path)
    args3.output_path = str(tmp_path / "out3.json")
    eval_model(args3)
    assert seen["batch"] == 8   # unset: measured single-chip wave size


def test_mixed_cli_flag(tmp_path, monkeypatch):
    """--mixed routes the co-resident pair to the measured-best split:
    int8 VQA decoder (int8=True, int4 off) + int4 VSM — free-form/MC at
    int8 speed, only searches pay the int4 kernels (r5)."""
    import vstar_tpu.eval.vstar_bench as vb

    _mk_benchmark(tmp_path, n_direct=1, n_rel=1)
    quant = {}

    def fake_vqa(*a, **k):
        quant["vqa"] = {f: k.get(f) for f in ("int8", "int4")}
        return _vqa_factory()

    def fake_vsm(*a, **k):
        quant["vsm"] = {f: k.get(f) for f in ("int8", "int4")}
        return _vsm_factory()

    monkeypatch.setattr(vb, "load_vqa_engine", fake_vqa)
    monkeypatch.setattr(vb, "load_vsm_engine", fake_vsm)
    args = vb.build_parser().parse_args(
        ["--single-chip-phased", "--coresident", "--int4", "--mixed"])
    args.benchmark_folder = str(tmp_path)
    args.output_path = str(tmp_path / "out_mixed.json")
    results, _, timings = eval_model(args)
    assert quant["vqa"] == {"int8": True, "int4": False}
    assert quant["vsm"]["int4"] is True
    assert timings["swap_total_s"] == 0.0
    out = json.load(open(tmp_path / "out_mixed.json"))
    assert out["direct_attributes"][0]["missing_objects"] == ["tiny cup"]
    # --mixed alone (no --int4) must still put the VSM on int4
    args2 = vb.build_parser().parse_args(
        ["--single-chip-phased", "--coresident", "--mixed"])
    args2.benchmark_folder = str(tmp_path)
    args2.output_path = str(tmp_path / "out_mixed2.json")
    eval_model(args2)
    assert quant["vsm"]["int4"] is True
    assert quant["vqa"] == {"int8": True, "int4": False}


def test_free_engine_drops_residency():
    eng = _vsm_factory()
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    eng._canvas(img)
    assert len(eng._canvas_cache) == 1
    free_engine(eng)
    assert eng.params is None and len(eng._canvas_cache) == 0

    from vstar_tpu.search.compiled import CompiledVSMSearch
    comp = CompiledVSMSearch(_vsm_factory(), P=4)
    free_engine(comp)
    assert comp.engine.params is None


def test_parked_factory_swaps_from_host_ram(tmp_path):
    """parked_factory: the underlying factory (the checkpoint read) runs
    ONCE; later swaps re-upload the parked host copy, the engine object
    persists, and the phased records bit-match the plain-factory run."""
    from vstar_tpu.eval.phased import parked_factory

    _mk_benchmark(tmp_path, n_direct=1, n_rel=1)
    want, _, _ = eval_model_phased(str(tmp_path), _vqa_factory,
                                   _vsm_factory, batch=2, log=None)

    calls = {"vqa": 0, "vsm": 0}
    engines = {}

    def counting_vqa():
        calls["vqa"] += 1
        engines["vqa"] = _vqa_factory()
        return engines["vqa"]

    pf_vqa = parked_factory(counting_vqa)

    def counting_vsm():
        calls["vsm"] += 1
        return _vsm_factory()

    got, _, _ = eval_model_phased(str(tmp_path), pf_vqa,
                                  parked_factory(counting_vsm),
                                  batch=2, log=None)
    # phase 3 re-entered the VQA through the parked path, not the factory
    assert calls == {"vqa": 1, "vsm": 1}
    assert got == want
    # the parked engine object persisted and its params were re-uploaded
    # (free_engine nulled them at the swap; the wrapper restored them)
    eng = pf_vqa()
    assert eng is engines["vqa"]
    assert eng.params is not None
