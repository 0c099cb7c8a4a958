"""Step-granular auto-resume (VERDICT r2 weak #6): a crash mid-epoch
resumes from the rolling 'latest' checkpoint losing <= save_steps steps,
and the resumed run is bit-identical to an uninterrupted one — the seeded
samplers fast-forward deterministically (data/vsm_datasets.fast_forward)."""

import json
import os
import random

import jax
import numpy as np
import pytest
from PIL import Image

from tests.test_data import WordTokenizer
from tests.test_train_loop import _vsm_args
from vstar_tpu.data.vsm_datasets import HybridDataset


class FakeChild:
    """Multi-row samples with rng-dependent row counts — exercises the
    partial-sample boundary replay (a batch boundary rarely aligns with a
    sample boundary)."""

    def __init__(self, seed):
        self.rng = random.Random(seed)
        self.decodes = 0

    def sample_rows(self):
        from vstar_tpu.data import vsm_datasets as V
        n = self.rng.randint(1, 3)
        rows = []
        for _ in range(n):
            if not V._FAST_FORWARD:
                self.decodes += 1     # stands in for the image decode
            rows.append((self.rng.random(), self.rng.randint(0, 999)))
        return rows


def test_hybrid_skip_batches_exact():
    def stream(skip):
        ds = HybridDataset([FakeChild(3), FakeChild(4)], [2, 1],
                           samples_per_epoch=40, seed=9)
        return list(ds.batches(5, skip_batches=skip)), ds

    full, _ = stream(0)
    # every offset, incl. boundaries inside the epoch's LAST sample (the
    # tail batches used to be dropped when the skip loop consumed all
    # samples_per_epoch draws before flushing the boundary buffer)
    for k in range(1, len(full) + 1):
        got, ds = stream(k)
        assert got == full[k:], f"skip={k} diverged"

    # fast-forward must not pay the decode cost of the skipped prefix
    _, ds = stream(7)
    full_ds = HybridDataset([FakeChild(3), FakeChild(4)], [2, 1],
                            samples_per_epoch=40, seed=9)
    list(full_ds.batches(5))
    skipped_decodes = sum(c.decodes for c in ds.children)
    full_decodes = sum(c.decodes for c in full_ds.children)
    assert skipped_decodes < full_decodes * 0.75


def test_hybrid_epoch_streams_deterministic():
    """Each epoch's stream is a function of (seed, epoch) alone: distinct
    across epochs, and reproducible by a FRESH dataset regardless of how
    much of any earlier epoch was consumed (prefetch threads over-draw the
    shared rng, so 'wherever epoch E-1 stopped' is timing-dependent)."""
    import itertools

    def fresh():
        return HybridDataset([FakeChild(3), FakeChild(4)], [2, 1],
                             samples_per_epoch=20, seed=9)

    ds = fresh()
    full0 = list(ds.batches(5, epoch=0))
    full1 = list(ds.batches(5, epoch=1))
    assert full0 != full1

    # partially consume epoch 0 (simulating a prefetch thread stopping at
    # an arbitrary point), then epoch 1 must still be full1 exactly
    ds2 = fresh()
    list(itertools.islice(ds2.batches(5, epoch=0), 3))
    assert list(ds2.batches(5, epoch=1)) == full1

    # a fresh process resuming into epoch 1 mid-stream reproduces its tail
    assert list(fresh().batches(5, skip_batches=2, epoch=1)) == full1[2:]


def test_hybrid_skip_inside_last_sample():
    """Boundary inside the epoch's LAST sample: the remaining rows must
    still be yielded (they used to be silently dropped, breaking the
    resumed stream at the epoch tail with a StopIteration upstream)."""

    class Fixed5:
        def __init__(self):
            self.rng = random.Random(0)

        def sample_rows(self):
            return [self.rng.randint(0, 999) for _ in range(5)]

    def stream(skip):
        ds = HybridDataset([Fixed5()], [1], samples_per_epoch=3, seed=1)
        return list(ds.batches(2, skip_batches=skip))

    full = stream(0)
    assert len(full) == 7  # 15 rows -> 7 full pairs
    # skip=6: the boundary lands 2 rows into the 3rd (last) sample
    assert stream(6) == full[6:]


def _vqa_dataset_dir(tmp_path, n_images=5):
    os.makedirs(tmp_path / "vqa_data" / "coco_images")
    rng = np.random.RandomState(1)
    items = []
    for i in range(n_images):
        name = f"img{i}.jpg"
        Image.fromarray((rng.rand(40, 52, 3) * 255).astype("uint8")).save(
            tmp_path / "vqa_data" / "coco_images" / name)
        items.append({"image": name, "conversations": [
            {"from": "human", "value": f"<image>\nwhere is thing {i}?"},
            {"from": "gpt", "value": f"at location {i}"}]})
    json.dump(items, open(
        tmp_path / "vqa_data" / "possible_locations_conv_86k.json", "w"))


def test_mid_epoch_crash_resume_bitwise_epoch1(tmp_path):
    """Crash inside epoch 1 (not 0): the resumed run must fast-forward
    within EPOCH 1's sample stream, not replay epoch 0's (each epoch
    reseeds from (seed, epoch) — HybridDataset.batches(epoch=...))."""
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.train import train_vsm_main as T

    cfg = vsm_tiny()
    _vqa_dataset_dir(tmp_path)
    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")

    ref = T.run_vsm_training(
        _vsm_args(tmp_path, epochs=2, steps_per_epoch=3, save_steps=2,
                  exp_name="ref2"), cfg,
        init_vsm_params(jax.random.PRNGKey(0), cfg), tok, loc_id)

    class Bomb(T.StepTimer):
        calls = 0

        def step_done(self):
            super().step_done()
            Bomb.calls += 1
            if Bomb.calls == 6:      # epoch 1, step_i=2 (post step-1 save)
                raise RuntimeError("simulated crash")

    orig = T.StepTimer
    T.StepTimer = Bomb
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            T.run_vsm_training(
                _vsm_args(tmp_path, epochs=2, steps_per_epoch=3,
                          save_steps=2, exp_name="crash2"),
                cfg, init_vsm_params(jax.random.PRNGKey(0), cfg), tok,
                loc_id)
    finally:
        T.StepTimer = orig

    meta = json.load(open(
        tmp_path / "runs" / "crash2" / "ckpt_latest" / "meta.json"))
    assert meta["epoch"] == 1 and meta["step"] == 1

    res = T.run_vsm_training(
        _vsm_args(tmp_path, epochs=2, steps_per_epoch=3, save_steps=2,
                  exp_name="crash2"),
        cfg, init_vsm_params(jax.random.PRNGKey(5), cfg), tok, loc_id)

    assert int(res.step) == int(ref.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_mid_epoch_crash_resume_bitwise(tmp_path):
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.train import train_vsm_main as T

    cfg = vsm_tiny()
    _vqa_dataset_dir(tmp_path)
    tok = WordTokenizer()
    loc_id = tok._word_id("[LOC]")

    def fresh_params():
        return init_vsm_params(jax.random.PRNGKey(0), cfg)

    # uninterrupted reference: 6 steps
    ref = T.run_vsm_training(
        _vsm_args(tmp_path, epochs=1, steps_per_epoch=6, save_steps=2,
                  exp_name="ref"), cfg, fresh_params(), tok, loc_id)

    # crashed run: StepTimer raises after the 4th completed step
    class Bomb(T.StepTimer):
        calls = 0

        def step_done(self):
            super().step_done()
            Bomb.calls += 1
            if Bomb.calls == 4:
                raise RuntimeError("simulated crash")

    orig = T.StepTimer
    T.StepTimer = Bomb
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            T.run_vsm_training(
                _vsm_args(tmp_path, epochs=1, steps_per_epoch=6,
                          save_steps=2, exp_name="crash"),
                cfg, fresh_params(), tok, loc_id)
    finally:
        T.StepTimer = orig

    # crash happened during step 3 (before its rolling save) -> last
    # durable state is the step-1 save: exactly "loses <= save_steps"
    latest = tmp_path / "runs" / "crash" / "ckpt_latest" / "meta.json"
    meta = json.load(open(latest))
    assert meta["epoch"] == 0 and meta["step"] == 1

    # resume (different initial params — must come from the checkpoint)
    res = T.run_vsm_training(
        _vsm_args(tmp_path, epochs=1, steps_per_epoch=6, save_steps=2,
                  exp_name="crash"),
        cfg, init_vsm_params(jax.random.PRNGKey(5), cfg), tok, loc_id)

    assert int(res.step) == int(ref.step) == 6
    ref_leaves = jax.tree_util.tree_leaves(ref.params)
    res_leaves = jax.tree_util.tree_leaves(res.params)
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_vqa_mid_epoch_crash_resume_bitwise(tmp_path):
    """The VQA trainer (run_training) has the same step-granular rolling
    save + auto-resume as the VSM trainer: crash at epoch 1 step 2 (after
    the step-1 save), resume, and the final TrainState is bit-identical
    to an uninterrupted run — the sequential loader fast-forwards by an
    exact index slice."""
    import types

    from vstar_tpu.core.config import vqa_llm_tiny
    from vstar_tpu.data.pretrain_dataset import (PretrainCaptionDataset,
                                                 collate_pretrain)
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from vstar_tpu.train import train_vqa_main as T
    from vstar_tpu.train.train_vqa_main import (projector_only_mask,
                                                run_training)

    cfg = vqa_llm_tiny()
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    items = []
    for i in range(8):
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

    def mkargs(out):
        return types.SimpleNamespace(
            stage="pretrain", mesh="4x2x1", param_dtype="f32",
            hbm_gb=16.0, per_device_batch_size=2, num_train_epochs=2,
            log_every=10, output_dir=str(out), data_workers=2,
            prefetch_depth=2, auto_resume=True, save_steps=2)

    tok = WordTokenizer()

    def fresh_params(seed):
        return init_vqa_llm_params(jax.random.PRNGKey(seed), cfg)

    mask = projector_only_mask(fresh_params(0), "linear")
    ref = run_training(mkargs(tmp_path / "ref"), cfg, fresh_params(0), ds,
                       collate, tok, mask, lr=1e-3)
    assert int(ref.step) == 8            # 4 steps/epoch x 2 epochs

    class Bomb(T.StepTimer):
        calls = 0

        def step_done(self):
            super().step_done()
            Bomb.calls += 1
            if Bomb.calls == 7:          # epoch 1, step_i=2 (post save@1)
                raise RuntimeError("simulated crash")

    orig = T.StepTimer
    T.StepTimer = Bomb
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_training(mkargs(tmp_path / "out"), cfg, fresh_params(0),
                         ds, collate, tok, mask, lr=1e-3)
    finally:
        T.StepTimer = orig

    meta = json.load(open(
        tmp_path / "out" / "ckpt_latest" / "meta.json"))
    assert meta["epoch"] == 1 and meta["step"] == 1

    # resume with junk init params — they must come from the checkpoint
    res = run_training(mkargs(tmp_path / "out"), cfg, fresh_params(5), ds,
                       collate, tok, mask, lr=1e-3)
    assert int(res.step) == int(ref.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
