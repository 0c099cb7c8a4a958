"""End-to-end smoke of the VQA trainer loop (run_training): real dataset
files, prefetched input pipeline, mesh + memory check, jitted steps."""

import json
import os
import types

import jax
import numpy as np
from PIL import Image

from tests.test_data import WordTokenizer
from vstar_tpu.core.config import vqa_llm_tiny
from vstar_tpu.data.pretrain_dataset import (PretrainCaptionDataset,
                                             collate_pretrain)
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.train.train_vqa_main import projector_only_mask, run_training


def test_run_training_pretrain_tiny(tmp_path):
    cfg = vqa_llm_tiny()
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    items = []
    rng = np.random.RandomState(0)
    for i in range(4):
        fname = f"im{i}.jpg"
        Image.fromarray((rng.rand(40, 52, 3) * 255).astype("uint8")).save(
            img_dir / fname)
        items.append({"image": fname, "conversations": [
            {"from": "human", "value": "<image>\ndescribe"},
            {"from": "gpt", "value": f"a photo number {i}"}]})
    data_path = tmp_path / "pretrain.json"
    json.dump(items, open(data_path, "w"))

    ds = PretrainCaptionDataset(str(data_path), str(img_dir),
                                image_size=cfg.vision.image_size)

    def collate(instances, tok):
        return collate_pretrain(instances, tok,
                                n_long=cfg.image_tokens_long,
                                n_short=cfg.image_tokens_short,
                                image_long=True, seq_bucket=64)

    args = types.SimpleNamespace(
        stage="pretrain", mesh="4x2x1", param_dtype="f32", hbm_gb=16.0,
        per_device_batch_size=2, num_train_epochs=2, log_every=1,
        output_dir=str(tmp_path / "out"), data_workers=2, prefetch_depth=2)

    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg)
    mask = projector_only_mask(params, "linear")
    state = run_training(args, cfg, params, ds, collate, WordTokenizer(),
                         mask, lr=1e-3)

    assert int(state.step) == 4  # 2 batches/epoch x 2 epochs
    lines = open(tmp_path / "out" / "metrics.jsonl").read().splitlines()
    assert lines and np.isfinite(json.loads(lines[-1])["loss"])


def _vsm_args(tmp_path, epochs, steps_per_epoch=1, save_steps=0,
              exp_name="vsm_tiny"):
    return types.SimpleNamespace(
        dataset_dir=str(tmp_path), log_base_dir=str(tmp_path / "runs"),
        exp_name=exp_name, epochs=epochs, steps_per_epoch=steps_per_epoch,
        batch_size=1, grad_accumulation_steps=1, lr=1e-3,
        ce_loss_weight=1.0, dice_loss_weight=0.5, bce_loss_weight=2.0,
        det_loss_weight=0.1, warmup_steps=1, seq_bucket=64,
        prefetch_depth=2, mask_res=12, mesh="4x2x1", param_dtype="f32",
        hbm_gb=16.0, auto_resume=True, no_eval=True, dataset="vqa",
        sample_rates="1", save_steps=save_steps)


def test_run_vsm_training_tiny_and_auto_resume(tmp_path):
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.train.train_vsm_main import run_vsm_training

    cfg = vsm_tiny()
    os.makedirs(tmp_path / "vqa_data" / "coco_images")
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(40, 52, 3) * 255).astype("uint8")).save(
        tmp_path / "vqa_data" / "coco_images" / "img0.jpg")
    json.dump([{"image": "img0.jpg", "conversations": [
        {"from": "human", "value": "<image>\nwhere is the cup?"},
        {"from": "gpt", "value": "on the table"}]}],
        open(tmp_path / "vqa_data" / "possible_locations_conv_86k.json",
             "w"))

    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")
    params = init_vsm_params(jax.random.PRNGKey(0), cfg)

    state = run_vsm_training(_vsm_args(tmp_path, epochs=1), cfg, params,
                             tok, loc_id)
    assert int(state.step) == 1
    meta = json.load(open(tmp_path / "runs" / "vsm_tiny" / "ckpt_model"
                          / "meta.json"))
    assert meta["epoch"] == 0

    # second invocation resumes from the checkpoint and trains epoch 1 only
    params2 = init_vsm_params(jax.random.PRNGKey(7), cfg)
    state2 = run_vsm_training(_vsm_args(tmp_path, epochs=2), cfg, params2,
                              tok, loc_id)
    assert int(state2.step) == 2
    meta = json.load(open(tmp_path / "runs" / "vsm_tiny" / "ckpt_model"
                          / "meta.json"))
    assert meta["epoch"] == 1
