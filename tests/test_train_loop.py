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
