"""Learnability gate for the VQA-LLM SFT stack (the stage-2 analog of
tests/test_learnability.py): the REAL `sft_train_step` — spliced
multimodal forward, preprocess_v1 label masking, frozen CLIP tower,
AdamW + warmup-cosine — must teach a tiny LLaVA to ANSWER FROM THE
IMAGE, verified end to end through the production `VQAEngine.free_form`
decode (the surface the reference gates with, vstar_bench_eval.py:78-114).

Task: the image is filled red or blue (under pixel noise; the tower is
random AND frozen, so only the projector + decoder can learn the
mapping); the model must answer "red"/"blue" to "what color is this
image ?" on held-out noise seeds."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tests.test_data import WordTokenizer
from vstar_tpu.core.config import vqa_llm_tiny
from vstar_tpu.data.preprocess import clip_preprocess
from vstar_tpu.data.vqa_sft_dataset import collate_vqa_sft
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.train.sft import (init_train_state, make_frozen_vision_mask,
                                 make_optimizer, sft_train_step)

CFG = vqa_llm_tiny()
QUESTION = "what color is this image ?"
COLORS = {"red": (220, 40, 40), "blue": (40, 60, 220)}


def _image(color: str, seed: int) -> Image.Image:
    rng = np.random.RandomState(seed)
    side = 48
    arr = np.clip(np.asarray(COLORS[color], np.float32)
                  + rng.randn(side, side, 3) * 18, 0, 255)
    return Image.fromarray(arr.astype(np.uint8))


def _instance(color: str, seed: int):
    img = _image(color, seed)
    size = CFG.vision.image_size
    return {
        "source": [
            {"from": "human", "value": "<image>\n" + QUESTION},
            {"from": "gpt", "value": color}],
        "has_image": True, "is_search": False,
        "image": clip_preprocess(img, size),
        "objects": np.zeros((CFG.max_objects, size, size, 3), np.float32),
        "images_long": True, "objects_long": [False] * CFG.max_objects,
    }


def test_sft_stack_learns_color_vqa():
    tok = WordTokenizer()
    params = init_vqa_llm_params(jax.random.PRNGKey(0), CFG,
                                 dtype=jnp.float32)
    mask = make_frozen_vision_mask(params)
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=10,
                         total_steps=400, trainable_mask=mask)
    state = init_train_state(params, opt)
    step = jax.jit(functools.partial(
        sft_train_step, cfg=CFG, optimizer=opt, trainable_mask=mask,
        compute_dtype=jnp.float32))

    rng = np.random.RandomState(0)
    losses = []
    for it in range(220):
        colors = [("red", "blue")[rng.randint(2)] for _ in range(8)]
        batch = collate_vqa_sft(
            [_instance(c, rng.randint(10_000)) for c in colors], tok,
            n_long=CFG.image_tokens_long, n_short=CFG.image_tokens_short,
            seq_bucket=64, max_objects=CFG.max_objects)
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()})
        losses.append(float(metrics["loss"]))

    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # held-out gate through the PRODUCTION engine (fresh noise seeds,
    # disjoint from training's rng stream)
    eng = VQAEngine(state.params, CFG, tok, prompt_buckets=(64,),
                    option_bucket=16, compute_dtype=jnp.float32)
    eng._spec_template = None
    correct = 0
    cases = [("red", 50_001), ("blue", 50_002), ("red", 50_003),
             ("blue", 50_004), ("red", 50_005), ("blue", 50_006)]
    for color, seed in cases:
        ans = eng.free_form(_image(color, seed), QUESTION,
                            max_new_tokens=3)
        # WordTokenizer.decode renders ids as "t<id>" — compare against
        # the color word's rendering, not the raw word
        want = tok.decode([tok._word_id(color)])
        correct += int(ans.split()[0] == want if ans else False)
    assert correct >= 5, (correct, len(cases))
