"""VSM + SFT train-step timing on the real chip.

Round 1 could not run training on the relay at all (the Hungarian
pure_callback is unsupported there); with the on-device auction matcher
as the default assignment the full multi-loss VSM step is callback-free.
A 16 GB chip cannot hold 32-layer 7B grads, so this measures FULL-WIDTH
decoders at reduced depth (the per-layer cost extrapolates linearly) with
the real towers, heads, Pallas flash attention (kv_valid path), LoRA
masking and AdamW update.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_step_bench.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import vqa_llm_7b, vsm_7b
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.multimodal.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vstar_tpu.multimodal.splicing import build_layout, stack_layouts
from vstar_tpu.train.lora import add_lora, vsm_trainable_mask
from vstar_tpu.train.sft import (init_train_state, make_optimizer,
                                 sft_train_step)
from vstar_tpu.train.vsm_train import (VSMTrainState, make_vsm_optimizer,
                                       vsm_train_step)

LAYERS = 2
B, S = 2, 512


def shallow(cfg_llama):
    return dataclasses.replace(cfg_llama, num_layers=LAYERS)


def time_steps(name, step, state, batch, n=3):
    state, m = step(state, batch)          # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
        float(m["loss"])                   # scalar fetch = relay sync
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1000:8.1f} ms/step "
          f"(B={B}, S={S}, {LAYERS} full-width layers)", flush=True)
    return dt


def vsm_batch(cfg):
    rng = np.random.RandomState(3)
    n_img = cfg.image_tokens
    ids = [1, IMAGE_TOKEN_INDEX] + list(rng.randint(10, 30000, size=40))
    labels = [IGNORE_INDEX] * (len(ids) - 6) + list(
        rng.randint(10, 30000, size=6))
    lay = build_layout(ids, S, n_long=n_img, n_short=0, image_long=True,
                       labels=labels)
    text_ids, feat_idx, is_feat, lens, labs = stack_layouts([lay] * B)
    kv_valid = np.zeros((B, S), bool)
    for b in range(B):
        kv_valid[b, :lay.length] = True
    g = 768
    return {
        "images_clip": jnp.asarray(
            rng.randn(B, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.float32),
        "images_owl": jnp.asarray(
            rng.randn(B, cfg.owl_vision.image_size,
                      cfg.owl_vision.image_size, 3), jnp.float32),
        "text_ids": jnp.asarray(text_ids),
        "feat_idx": jnp.asarray(feat_idx),
        "is_feat": jnp.asarray(is_feat),
        "lens": jnp.asarray(lens),
        "labels": jnp.asarray(labs),
        "kv_valid": jnp.asarray(kv_valid),
        "loc_hidden_pos": jnp.asarray([lay.length - 2] * B, jnp.int32),
        "gt_masks": jnp.asarray(
            (rng.rand(B, g, g) > 0.5).astype(np.float32)),
        "masks_valid": jnp.ones((B,), bool),
        "tgt_boxes": jnp.asarray(
            rng.uniform(0.2, 0.5, (B, 8, 4)), jnp.float32),
        "tgt_valid": jnp.asarray(
            np.tile([[1, 1, 1, 0, 0, 0, 0, 0]], (B, 1)).astype(bool)),
        "bboxes_valid": jnp.ones((B,), bool),
    }


def sft_batch(cfg):
    rng = np.random.RandomState(4)
    ids = [1, IMAGE_TOKEN_INDEX, 9] + list(rng.randint(10, 30000, size=30))
    labels = [IGNORE_INDEX] * (len(ids) - 8) + list(
        rng.randint(10, 30000, size=8))
    lay = build_layout(ids, S, n_long=cfg.image_tokens_long,
                       n_short=cfg.image_tokens_short, image_long=False,
                       labels=labels)
    text_ids, feat_idx, is_feat, lens, labs = stack_layouts([lay] * B)
    kv_valid = np.zeros((B, S), bool)
    for b in range(B):
        kv_valid[b, :lay.length] = True
    size = cfg.vision.image_size
    return {
        "image": jnp.asarray(rng.randn(B, size, size, 3), jnp.float32),
        "objects": jnp.asarray(rng.randn(B, 3, size, size, 3), jnp.float32),
        "text_ids": jnp.asarray(text_ids),
        "feat_idx": jnp.asarray(feat_idx),
        "is_feat": jnp.asarray(is_feat),
        "lens": jnp.asarray(lens),
        "labels": jnp.asarray(labs),
        "kv_valid": jnp.asarray(kv_valid),
    }


def main():
    print("devices:", jax.devices())

    # --- VSM multi-loss step (LoRA r8 + heads trainable) ---------------
    cfg = vsm_7b()
    cfg = dataclasses.replace(cfg, llama=shallow(cfg.llama))
    params = init_vsm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params["llama"] = add_lora(params["llama"], jax.random.PRNGKey(1),
                               r=8, alpha=16)
    mask = vsm_trainable_mask(params)
    opt = make_vsm_optimizer(1e-4, 10, 1000, trainable_mask=mask)
    state = jax.jit(lambda p: VSMTrainState(p, opt.init(p),
                                            jnp.zeros((), jnp.int32)))(params)
    step = jax.jit(lambda st, b: vsm_train_step(st, b, cfg, opt, mask),
                   donate_argnums=(0,))
    time_steps("VSM step (CE+mask+DETR, LoRA+heads)", step, state,
               vsm_batch(cfg))
    del params, state

    # --- VQA SFT step (full decoder trainable, vision frozen) ----------
    qcfg = vqa_llm_7b()
    qcfg = dataclasses.replace(qcfg, llama=shallow(qcfg.llama))
    qparams = init_vqa_llm_params(jax.random.PRNGKey(2), qcfg,
                                  dtype=jnp.bfloat16)
    from vstar_tpu.train.train_vqa_main import frozen_vision_mask
    qmask = frozen_vision_mask(qparams)
    qopt = make_optimizer(2e-5, 10, 1000, trainable_mask=qmask)
    qstate = jax.jit(lambda p: init_train_state(p, qopt))(qparams)
    qstep = jax.jit(lambda st, b: sft_train_step(st, b, qcfg, qopt, qmask),
                    donate_argnums=(0,))
    time_steps("SFT step (full decoder, dual projectors)", qstep, qstate,
               sft_batch(qcfg))


if __name__ == "__main__":
    main()
