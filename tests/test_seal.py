"""SEAL loop end-to-end tests with tiny models + scripted search oracle."""

import json
import os
import zlib

import jax
import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from vstar_tpu.core.config import vqa_llm_tiny
from vstar_tpu.eval.seal import (MISSING_OBJECTS_MSG, focus_prompt,
                                 parse_missing_objects, seal_answer)
from vstar_tpu.eval.vqa_engine import VQAEngine, get_patch
from vstar_tpu.models.vqa_llm import init_vqa_llm_params

CFG = vqa_llm_tiny()


class ToyTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [self.bos_token_id]
        for w in text.split():
            ids.append(3 + zlib.crc32(w.encode()) % (CFG.llama.vocab_size - 3))
        return self._Out(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids
                        if not (skip_special_tokens and i < 3))


@pytest.fixture(scope="module")
def vqa_engine():
    params = init_vqa_llm_params(jax.random.PRNGKey(21), CFG)
    return VQAEngine(params, CFG, ToyTokenizer(), prompt_buckets=(64, 128),
                     option_bucket=16, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def image():
    return Image.fromarray((np.random.RandomState(1).rand(120, 200, 3)
                            * 255).astype("uint8"))


def test_parse_missing_objects():
    assert parse_missing_objects("The answer is A.") == []
    pred = MISSING_OBJECTS_MSG + " red cup, blue book."
    assert parse_missing_objects(pred) == ["red cup", "blue book"]


def test_focus_prompt_format():
    p = focus_prompt("where?", ["cup", "book"],
                     [[0.1, 0.2, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8]])
    assert p.startswith("Additional visual information to focus on: "
                        "cup <object> at location [0.100,0.200,0.300,0.400]; "
                        "book <object> at location [0.500,0.600,0.700,0.800].")
    assert p.endswith("\nwhere?")


def test_get_patch_reference_semantics():
    # min-224 expansion and clipping (vstar_bench_eval.py:49-69)
    box = get_patch([10, 10, 20, 20], 500, 400)
    assert box == [0, 0, 224, 224]
    # scaled crop
    box = get_patch([100, 100, 50, 40], 500, 400, patch_scale=1.2)
    assert box[2] - box[0] <= 60 and box[3] - box[1] <= 48


def test_seal_no_search_path(vqa_engine, image):
    rec = seal_answer(vqa_engine, None, image, "what color?",
                      ["red", "blue"])
    assert rec["missing_objects"] == []
    assert rec["option_chosen"] in (0, 1)
    assert rec["search_result"] == []


def test_seal_with_search_path(vqa_engine, image, monkeypatch):
    # Force the missing-objects branch with a scripted free-form answer and
    # a scripted search client.
    monkeypatch.setattr(
        vqa_engine.__class__, "free_form",
        lambda self, img, q, **kw: MISSING_OBJECTS_MSG + " tiny cat.")

    class ScriptedVSM:
        def detect(self, patch, name):
            boxes = np.zeros((4, 4), np.float32)
            boxes[0] = [0.5, 0.5, 0.2, 0.2]
            logits = np.array([0.9, 0.0, 0.0, 0.0], np.float32)
            return boxes, logits, np.ones((patch.height, patch.width),
                                          np.float32)

        def vqa(self, patch, q):
            return "most likely to appear on the floor."

        def segment(self, patch, phrase):
            return np.ones((patch.height, patch.width), np.float32)

    rec = seal_answer(vqa_engine, ScriptedVSM(), image, "what color?",
                      ["red", "blue", "green", "none"])
    assert rec["missing_objects"] == ["tiny cat"]
    assert len(rec["search_result"]) == 1
    sr = rec["search_result"][0]
    assert sr["name"] == "tiny cat"
    # bbox = cxcywh(0.5,0.5,.2,.2) on the root patch -> centered box
    x, y, w, h = sr["bbox"]
    assert abs(x - (0.5 * 200 - 0.1 * 200)) < 1.5
    assert abs(w - 0.2 * 200) < 1.5
    assert rec["option_chosen"] in range(4)
