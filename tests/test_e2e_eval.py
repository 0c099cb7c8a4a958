"""Full V*Bench evaluator end-to-end on tiny REAL models (no stubs):
eval_model drives VQAEngine free-form decode, the VSM engine through the
search policy, and the focused multiple-choice scorer, writing the result
JSON in the reference schema."""

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vstar_tpu.core.config import vqa_llm_tiny, vsm_tiny
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.eval.vstar_bench import eval_model
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.engine import VSMEngine
from tests.test_data import WordTokenizer

VQA_CFG = vqa_llm_tiny()
VSM_CFG = vsm_tiny()


class ShortVQAEngine(VQAEngine):
    """Tiny-model engine with a short decode budget for test speed."""

    def free_form(self, image, question, **kw):
        kw.setdefault("max_new_tokens", 6)
        return super().free_form(image, question, **kw)


def test_eval_model_end_to_end(tmp_path):
    tok = WordTokenizer()
    vqa = ShortVQAEngine(
        init_vqa_llm_params(jax.random.PRNGKey(0), VQA_CFG), VQA_CFG, tok,
        prompt_buckets=(64, 128), option_bucket=16,
        compute_dtype=jnp.float32)
    vsm = VSMEngine(
        init_vsm_params(jax.random.PRNGKey(1), VSM_CFG), VSM_CFG, tok,
        loc_token_id=tok._word_id("[LOC]"), max_new_tokens=4,
        prompt_buckets=(64, 128), compute_dtype=jnp.float32)

    rng = np.random.RandomState(0)
    for tt in ("direct_attributes", "relative_position"):
        d = tmp_path / tt
        os.makedirs(d)
        Image.fromarray((rng.rand(250, 300, 3) * 255).astype("uint8")).save(
            d / "a.jpg")
        json.dump({"question": "what color is the cup?",
                   "options": ["red", "blue"]}, open(d / "a.json", "w"))

    args = types.SimpleNamespace(
        benchmark_folder=str(tmp_path), output_path=str(tmp_path / "o.json"),
        minimum_size_scale=4.0, minimum_size=224, conv_type="v1")
    results, accs, latencies = eval_model(args, vqa, vsm)

    out = json.load(open(tmp_path / "o.json"))
    for tt in ("direct_attributes", "relative_position"):
        assert len(out[tt]) == 1
        rec = out[tt][0]
        assert rec["option_chosen"] in (0, 1)
        assert rec["correct"] in (0, 1)
        assert isinstance(rec["prediction_freeform"], str)
    assert len(latencies) == 2
