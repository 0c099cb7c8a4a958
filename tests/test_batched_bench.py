"""Batched V*Bench driver test with stub engines + synthetic benchmark."""

import json
import os
import types

import numpy as np
from PIL import Image

from vstar_tpu.eval.batched_bench import eval_batch, eval_model_batched
from tests.test_serve import StubVQA, StubVSM


class BatchedStubVSM(StubVSM):
    def detect_many(self, patches, names):
        return [self.detect(p, n) for p, n in zip(patches, names)]

    def vqa_many(self, patches, qs):
        return [self.vqa(p, q) for p, q in zip(patches, qs)]

    def segment_many(self, patches, phrases):
        return [self.segment(p, ph) for p, ph in zip(patches, phrases)]


def _img(w=600, h=500):
    return Image.fromarray(np.zeros((h, w, 3), np.uint8))


def test_eval_batch_matches_serial_semantics():
    samples = [
        {"image": _img(), "question": "what color is the tiny cup?",
         "options": ["red", "blue", "x", "y"]},
        {"image": _img(640, 480), "question": "where is the tiny cup?",
         "options": ["left", "right", "up", "down"]},
    ]
    recs = eval_batch(StubVQA(), BatchedStubVSM(), samples)
    assert len(recs) == 2
    for rec in recs:
        assert rec["missing_objects"] == ["tiny cup"]
        assert len(rec["search_result"]) == 1
        assert rec["option_chosen"] == 1 and rec["correct"] == 0


def test_eval_model_batched_files(tmp_path):
    for tt in ("direct_attributes", "relative_position"):
        d = tmp_path / tt
        os.makedirs(d)
        for i in range(3):
            _img().save(d / f"s{i}.jpg")
            json.dump({"question": "what color is the tiny cup?",
                       "options": ["red", "blue", "c", "d"]},
                      open(d / f"s{i}.json", "w"))
    args = types.SimpleNamespace(
        benchmark_folder=str(tmp_path), minimum_size_scale=4.0,
        minimum_size=224, output_path=str(tmp_path / "out.json"))
    results = eval_model_batched(args, StubVQA(), BatchedStubVSM(),
                                 image_batch=2)
    assert len(results["direct_attributes"]) == 3
    assert len(results["relative_position"]) == 3
    out = json.load(open(tmp_path / "out.json"))
    assert set(out) == {"direct_attributes", "relative_position"}
    rec = out["direct_attributes"][0]
    assert {"question", "options", "image", "prediction_freeform",
            "missing_objects", "search_result", "option_chosen",
            "correct"} <= set(rec)


def test_vqa_engine_batched_methods_match_serial():
    import jax
    import jax.numpy as jnp
    from vstar_tpu.core.config import vqa_llm_tiny
    from vstar_tpu.eval.vqa_engine import VQAEngine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from tests.test_data import WordTokenizer

    cfg = vqa_llm_tiny()
    eng = VQAEngine(init_vqa_llm_params(jax.random.PRNGKey(5), cfg), cfg,
                    WordTokenizer(), prompt_buckets=(64, 128),
                    option_bucket=16, compute_dtype=jnp.float32)
    imgs = [Image.fromarray((np.random.RandomState(i).rand(40, 50, 3) * 255
                             ).astype("uint8")) for i in range(3)]
    qs = ["what color ?", "how many ?", "where is it ?"]

    serial = [eng.free_form(im, q, max_new_tokens=5)
              for im, q in zip(imgs, qs)]
    batched = eng.free_form_many(imgs, qs, max_new_tokens=5)
    assert serial == batched

    opts = [["red", "blue"], ["one", "two"], ["left", "right"]]
    serial_mc = [eng.multiple_choice(im, q, o)
                 for im, q, o in zip(imgs, qs, opts)]
    batched_mc = eng.multiple_choice_many(imgs, qs, opts)
    assert serial_mc == batched_mc


def test_eval_batch_real_engines_matches_serial_seal():
    """Fully-batched phases (free_form_many / lockstep search /
    multiple_choice_many) must reproduce the serial seal_answer records."""
    import jax
    import jax.numpy as jnp
    from vstar_tpu.core.config import vqa_llm_tiny, vsm_tiny
    from vstar_tpu.eval.seal import seal_answer
    from vstar_tpu.eval.vqa_engine import VQAEngine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.batched import BatchedVSMEngine
    from tests.test_data import WordTokenizer

    vqa_cfg, vsm_cfg = vqa_llm_tiny(), vsm_tiny()
    tok = WordTokenizer()

    class ShortVQA(VQAEngine):
        def free_form(self, image, question, **kw):
            kw.setdefault("max_new_tokens", 5)
            return super().free_form(image, question, **kw)

        def free_form_many(self, images, questions, **kw):
            kw.setdefault("max_new_tokens", 5)
            return super().free_form_many(images, questions, **kw)

    vqa = ShortVQA(init_vqa_llm_params(jax.random.PRNGKey(0), vqa_cfg),
                   vqa_cfg, tok, prompt_buckets=(64, 128), option_bucket=16,
                   compute_dtype=jnp.float32)
    vsm = BatchedVSMEngine(init_vsm_params(jax.random.PRNGKey(1), vsm_cfg),
                           vsm_cfg, tok, loc_token_id=tok._word_id("[LOC]"),
                           max_new_tokens=4, prompt_buckets=(64, 128),
                           compute_dtype=jnp.float32)

    rng = np.random.RandomState(7)
    samples = [{"image": Image.fromarray(
                    (rng.rand(230, 250, 3) * 255).astype("uint8")),
                "question": f"what color is object {i} ?",
                "options": ["red", "blue"]} for i in range(2)]

    from vstar_tpu.eval.batched_bench import eval_batch
    batched = eval_batch(vqa, vsm, samples, max_search_steps=4)
    serial = [seal_answer(vqa, vsm, s["image"], s["question"],
                          s["options"], max_search_steps=4)
              for s in samples]
    for b, s in zip(batched, serial):
        assert b["prediction_freeform"] == s["prediction_freeform"]
        assert b["missing_objects"] == s["missing_objects"]
        assert b["option_chosen"] == s["option_chosen"]
        assert len(b["search_result"]) == len(s["search_result"])
