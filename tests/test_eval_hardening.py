"""Eval edge cases (VERDICT r1 weak #6/#8) + multi-token keyword stopping
(missing #4): long options grow the scoring bucket instead of crashing,
oversized waves split into device batches, ReferSeg samples distinct
expressions, and free_form stops on decoded keyword strings."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vstar_tpu.core.config import vqa_llm_tiny
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params

from tests.test_data import WordTokenizer

CFG = vqa_llm_tiny()


@pytest.fixture(scope="module")
def params():
    return init_vqa_llm_params(jax.random.PRNGKey(0), CFG)


def _engine(params, **kw):
    kw.setdefault("prompt_buckets", (64, 128))
    kw.setdefault("option_bucket", 8)
    kw.setdefault("compute_dtype", jnp.float32)
    return VQAEngine(params, CFG, WordTokenizer(), **kw)


def _image(seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(64, 64, 3) * 255).astype("uint8"))


def test_long_option_grows_bucket(params):
    # options longer than the bucket (8) must score, and identically to a
    # roomy engine (growth changes padding, not math)
    small = _engine(params, option_bucket=8)
    roomy = _engine(params, option_bucket=64)
    image = _image()
    q = "where is the cup?"
    options = ["left",
               "on the wooden table next to the window near the red "
               "lamp beside the old books under the warm light of the "
               "corner reading area"]
    assert len(small._tokenize(small._prompt(q, options[1]))) > 8
    a = small.multiple_choice(image, q, options)
    b = roomy.multiple_choice(image, q, options)
    assert a == b


def test_multiple_choice_many_long_options(params):
    eng = _engine(params, option_bucket=8)
    images = [_image(i) for i in range(3)]
    qs = ["where is the cup?"] * 3
    opts = [["left", "on the wooden table next to the window near the "
             "red lamp beside the old books"]] * 3
    out = eng.multiple_choice_many(images, qs, opts)
    singles = [eng.multiple_choice(images[i], qs[i], opts[i])
               for i in range(3)]
    assert out == singles


def test_wave_split_free_form_many(params):
    eng = _engine(params)
    n = 18  # > the 16-row bucket: must split and still match per-item
    images = [_image(i % 4) for i in range(n)]
    qs = [f"what color is the object {i % 3}?" for i in range(n)]
    many = eng.free_form_many(images, qs, max_new_tokens=4)
    assert len(many) == n
    singles = [eng.free_form(images[i], qs[i], max_new_tokens=4)
               for i in range(n)]
    assert many == singles


def test_wave_split_multiple_choice_many(params):
    eng = _engine(params)
    n = 17
    images = [_image(i % 3) for i in range(n)]
    qs = ["where is the cup?"] * n
    opts = [["on the left", "on the right"]] * n
    many = eng.multiple_choice_many(images, qs, opts)
    assert len(many) == n
    singles = [eng.multiple_choice(images[i], qs[i], opts[i])
               for i in range(n)]
    assert many == singles


class TestKeywordStopping:

    def test_single_and_multi_token_keywords(self, params):
        eng = _engine(params)
        eng._spec_template = None  # plain greedy for the baseline
        image = _image(1)
        q = "describe the scene"
        full = eng.free_form(image, q, max_new_tokens=8)
        words = full.split()
        assert len(words) >= 3, f"tiny model generated too little: {full!r}"

        # single-word keyword: stop right before it
        kw = words[1]
        out = eng.free_form(image, q, max_new_tokens=8, stop_keywords=[kw])
        assert out == full.split(kw)[0].strip()

        # multi-token keyword spanning two generated tokens
        kw2 = " ".join(words[1:3])
        out2 = eng.free_form(image, q, max_new_tokens=8,
                             stop_keywords=[kw2])
        assert out2 == full.split(kw2)[0].strip()

        # non-occurring keyword: full output unchanged
        out3 = eng.free_form(image, q, max_new_tokens=8,
                             stop_keywords=["zzz-never-happens"])
        assert out3 == full


def test_refer_seg_distinct_expressions(tmp_path):
    from vstar_tpu.data.vsm_datasets import ReferSegDataset
    d = tmp_path / "refer_seg"
    os.makedirs(d)
    img_dir = d
    Image.new("RGB", (32, 32)).save(d / "img.jpg")
    item = {"image": "img.jpg",
            "expressions": ["a", "b", "c", "d"],
            "segmentation": [[1, 1, 20, 1, 20, 20, 1, 20]],
            "bbox": [1, 1, 20, 20]}
    json.dump([item], open(d / "refcoco.json", "w"))
    ds = ReferSegDataset(str(tmp_path), num_per_sample=3,
                         datasets=("refcoco",))
    for _ in range(10):
        rows = ds.sample_rows()
        texts = [r.source for r in rows]
        assert len(set(map(str, texts))) == len(texts), texts
