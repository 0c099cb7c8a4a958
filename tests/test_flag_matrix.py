"""Day-one flag-matrix sweep (eval/flag_matrix.py) dry-run on tiny random
weights: every opt-in cell constructs, runs the full inference surfaces,
and the greedy-equivalence invariant (prompt-lookup answer == base) holds
— so checkpoint day is one command producing every gate decision."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vqa_llm_tiny, vsm_tiny
from vstar_tpu.eval.flag_matrix import CELLS, format_table, run_flag_matrix
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine
from tests.test_data import WordTokenizer

VQA_CFG = vqa_llm_tiny()
VSM_CFG = vsm_tiny()


def test_flag_matrix_dry_run():
    # int8-quantized decoders so kv-int8/w8a8 cells exercise their real
    # code paths (the global toggle only changes quantized-entry matmuls)
    vqa_params = init_vqa_llm_params(jax.random.PRNGKey(0), VQA_CFG,
                                     quantize_llm=True)
    vsm_params = init_vsm_params(jax.random.PRNGKey(1), VSM_CFG,
                                 quantize_llm=True)
    # int4 cells re-init from the same keys (int4 is a different
    # quantization of the same underlying weights, like checkpoint day)
    vqa_params4 = init_vqa_llm_params(jax.random.PRNGKey(0), VQA_CFG,
                                      quantize_llm="int4")
    vsm_params4 = init_vsm_params(jax.random.PRNGKey(1), VSM_CFG,
                                  quantize_llm="int4")
    tok = WordTokenizer()

    class ShortVQA(VQAEngine):
        def free_form(self, image, question, **kw):
            kw.setdefault("max_new_tokens", 6)
            return super().free_form(image, question, **kw)

    def make_engines(kv_int8, prompt_lookup, compiled, int4=False):
        vq = ShortVQA(vqa_params4 if int4 else vqa_params, VQA_CFG, tok,
                      prompt_buckets=(64, 128),
                      option_bucket=16, compute_dtype=jnp.float32,
                      kv_int8=kv_int8, prompt_lookup=prompt_lookup)
        vs = BatchedVSMEngine(vsm_params4 if int4 else vsm_params,
                              VSM_CFG, tok,
                              loc_token_id=tok._word_id("[LOC]"),
                              max_new_tokens=4, prompt_buckets=(64, 128),
                              compute_dtype=jnp.float32, kv_int8=kv_int8,
                              device_preprocess=compiled,
                              speculative_template=None)
        if compiled:
            from vstar_tpu.search.compiled import CompiledVSMSearch
            vs = CompiledVSMSearch(vs, P=8)
        return vq, vs

    img = Image.fromarray((np.random.RandomState(0).rand(250, 300, 3)
                           * 255).astype("uint8"))
    rows = run_flag_matrix(make_engines, img, search_name="red thing",
                           log=None)

    assert [r["cell"] for r in rows] == [name for name, _ in CELLS]
    base = rows[0]
    by_cell = {r["cell"]: r for r in rows}
    # greedy equivalence: prompt-lookup must reproduce the base answer
    assert by_cell["prompt-lookup"]["answer_matches_base"] is True
    assert by_cell["prompt-lookup"]["option_matches_base"] is True
    # every cell actually ran both surfaces and measured latency
    for r in rows:
        assert r["free_form_s"] > 0 and r["search_s"] > 0
        assert isinstance(r["search_found"], bool)
        assert r["option"] in (0, 1, 2, 3)
    # the compiled cell went through CompiledVSMSearch (plen may be 0 —
    # a fallback FAILURE is a legitimate random-weight verdict)
    comp = by_cell["compiled-search"]
    assert comp["compiled"] is True
    assert comp["search_plen"] >= 0
    assert base["search_plen"] >= 0
    # the table renders every populated column
    table = format_table(rows)
    assert "free_form_s" in table and "all-opt-ins" in table


def test_flag_matrix_cell_isolation():
    """A failing cell records an error row and the sweep continues —
    hours of measured cells must survive one bad flag combination.
    A failing BASE cell still raises (no *_vs_base gate without it)."""
    import pytest

    from vstar_tpu.eval.flag_matrix import run_flag_matrix

    calls = []

    class MiniVQA:
        def free_form(self, image, question, **kw):
            return "an answer"

        def multiple_choice(self, image, question, options, **kw):
            return 1

    class MiniVSM:
        def detect(self, patch, name):
            boxes = np.zeros((2, 4), np.float32)
            boxes[0] = [0.2, 0.2, 0.1, 0.1]
            return boxes, np.asarray([0.9, 0.0], np.float32), \
                np.ones((patch.height, patch.width), np.float32)

        def vqa(self, patch, q):
            return "most likely to appear on the table."

        def segment(self, patch, phrase):
            return np.ones((patch.height, patch.width), np.float32)

    def make_engines(kv_int8, prompt_lookup, compiled, int4=False):
        calls.append((kv_int8, prompt_lookup, compiled, int4))
        if int4:
            raise RuntimeError("int4 importer declined")
        return MiniVQA(), MiniVSM()

    img = Image.fromarray(np.zeros((250, 300, 3), np.uint8))
    rows = run_flag_matrix(make_engines, img, search_name="red thing",
                           log=None)
    by_cell = {r["cell"]: r for r in rows}
    assert "int4 importer declined" in by_cell["int4"]["error"]
    assert "int4 importer declined" in by_cell["int4-all-opt-ins"]["error"]
    # cells after the failure still measured (instant stubs round to 0.0,
    # so assert presence rather than magnitude)
    assert "error" not in by_cell["compiled-search"]
    assert by_cell["compiled-search"]["search_found"] in (True, False)
    assert "error" not in by_cell["all-opt-ins"]
    assert "free_form_s" in by_cell["all-opt-ins"]
    assert "error" in format_table(rows)

    def broken_base(**kw):
        raise RuntimeError("no engines at all")

    with pytest.raises(RuntimeError, match="no engines"):
        run_flag_matrix(broken_base, img, log=None)


def test_runner_matrix_residency_modes(tmp_path):
    """Day-one residency gate (VERDICT r4 #7): phased base, parked-swap
    and co-resident cells all run the same benchmark; parked must match
    the base records bit-for-bit, co-residency reports zero swap time,
    and a failing optional cell isolates instead of losing the sweep."""
    from tests.test_phased_eval import (_mk_benchmark, _vqa_factory,
                                        _vsm_factory)
    from vstar_tpu.eval.flag_matrix import run_runner_matrix

    _mk_benchmark(tmp_path, n_direct=1, n_rel=1)

    def boom_factory():
        raise RuntimeError("int4 checkpoint missing")

    rows = run_runner_matrix(
        str(tmp_path), _vqa_factory, _vsm_factory,
        coresident_factories=(_vqa_factory, _vsm_factory),
        mixed_factories=(boom_factory, boom_factory),
        batch=2, log=None)
    by = {r["cell"]: r for r in rows}
    assert list(by) == ["phased", "parked", "coresident",
                        "mixed-coresident"]
    # parked swaps from host RAM — records must be bit-identical
    assert by["parked"]["records_match_base"] is True
    # same factories co-resident: identical too, and swap-free
    assert by["coresident"]["records_match_base"] is True
    assert by["coresident"]["swap_s"] == 0.0
    assert by["coresident"]["coresident"] is True
    for name in ("phased", "parked", "coresident"):
        r = by[name]
        assert r["images_per_s"] > 0 and r["accuracy"] is not None
        assert len(r["phases_s"]) == 3
    assert by["parked"]["accuracy_vs_base"] == 0.0
    # the failing optional cell recorded its error, others survived
    assert "int4 checkpoint missing" in by["mixed-coresident"]["error"]
