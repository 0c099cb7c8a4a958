"""VQA-LLM training CLIs.

Stage 1 (projector alignment; LLaVA/scripts/pretrain.sh + train.py):
  python -m vstar_tpu.train.train_vqa_main pretrain \\
      --data_path blip_laion_cc_sbu_558k.json --image_folder images \\
      --projector linear|perceiver
  Trains ONLY the selected projector (plus nothing else), lr 2e-3 linear /
  2e-4 perceiver, and exports just the adapter (mm_projector.bin
  equivalent; llava_trainer.py:150-175).

Stage 2 (search instruction finetune; finetune.sh + train_search.py):
  python -m vstar_tpu.train.train_vqa_main finetune \\
      --model_path <seal_vqa ckpt> --data_path <6-json dir> \\
      --image_folder <images>
  Full-model SFT (vision tower frozen) on the search-instruction mixture,
  bf16, lr 2e-5 — HF Trainer + ZeRO-2 replaced by the pjit-sharded step.
"""

from __future__ import annotations

import argparse
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_params, save_params
from ..core.config import vqa_llm_7b
from ..core.mesh import global_batch, make_mesh, shard_params
from ..core.params import map_with_path
from ..data.prefetch import prefetch_map
from ..utils.metrics import AverageMeter, StepTimer
from .sft import (TrainState, init_train_state, make_optimizer,
                  sft_train_step)


def _common(p):
    p.add_argument("--data_path", required=True)
    p.add_argument("--image_folder", required=True)
    p.add_argument("--output_dir", default="./runs/vqa")
    p.add_argument("--num_train_epochs", default=1, type=int)
    p.add_argument("--per_device_batch_size", default=4, type=int)
    p.add_argument("--seq_bucket", default=2048, type=int)
    p.add_argument("--log_every", default=50, type=int)
    p.add_argument("--mesh", default=None,
                   help="DxFxM mesh shape (data x fsdp x model), e.g. 1x8x1;"
                   " default: all devices on fsdp when >1 device")
    p.add_argument("--param_dtype", choices=["bf16", "f32"], default="bf16",
                   help="parameter storage dtype; bf16 + f32 masters in the"
                   " optimizer is the DeepSpeed-bf16-mode equivalent")
    p.add_argument("--hbm_gb", default=16.0, type=float,
                   help="per-chip HBM for the startup memory check")
    p.add_argument("--data_workers", default=2, type=int,
                   help="threads fetching+collating batches ahead of the "
                        "device (DataLoader num_workers equivalent)")
    p.add_argument("--prefetch_depth", default=4, type=int)
    p.add_argument("--no_shuffle", dest="shuffle", action="store_false",
                   default=True,
                   help="disable the per-epoch (data_seed, epoch)-seeded "
                        "row shuffle (HF Trainer shuffles by default)")
    p.add_argument("--data_seed", default=0, type=int)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--save_steps", default=500, type=int,
                   help="rolling 'latest' TrainState checkpoint every N "
                        "steps (0 disables); crash resume loses <= N steps "
                        "(HF Trainer save_steps/resume_from_checkpoint "
                        "equivalent). The loader is sequential, so the "
                        "fast-forward is an exact index skip.")


def parse_args(argv=None):
    p = argparse.ArgumentParser("vstar_tpu VQA-LLM training")
    sub = p.add_subparsers(dest="stage", required=True)
    pre = sub.add_parser("pretrain")
    _common(pre)
    pre.add_argument("--projector", choices=["linear", "perceiver"],
                     default="linear")
    pre.add_argument("--learning_rate", default=None, type=float)
    fin = sub.add_parser("finetune")
    _common(fin)
    fin.add_argument("--model_path", required=True)
    fin.add_argument("--learning_rate", default=2e-5, type=float)
    return p.parse_args(argv)


def projector_only_mask(params, which: str):
    key = "proj_image." if which == "linear" else "proj_object."
    return map_with_path(lambda path, _: path.startswith(key), params)


def frozen_vision_mask(params):
    return map_with_path(lambda path, _: not path.startswith("vision."),
                         params)


def run_training(args, cfg, params, dataset, collate_fn, tokenizer,
                 trainable_mask, lr):
    from ..core.memory import (check_memory, parse_mesh_arg,
                               plan_train_memory)
    master_f32 = args.param_dtype == "bf16"
    mesh = make_mesh(parse_mesh_arg(args.mesh, len(jax.devices())))
    check_memory(plan_train_memory(params, mesh,
                                   trainable_mask=trainable_mask,
                                   master_f32=master_f32),
                 hbm_gb=args.hbm_gb,
                 what=f"{args.stage} (mesh {dict(mesh.shape)})")
    params = shard_params(params, mesh)
    # one optimizer step consumes process_count batches (each host takes
    # its stride), so the schedule counts global steps
    steps_per_epoch = max(len(dataset) // args.per_device_batch_size
                          // jax.process_count(), 1)
    total = steps_per_epoch * args.num_train_epochs
    opt = make_optimizer(lr, warmup_steps=min(100, total // 10),
                         total_steps=total, trainable_mask=trainable_mask,
                         master_f32=master_f32)
    # init under jit so optimizer state inherits the params' mesh sharding
    # (eager init commits scalars to device 0 — see train_vsm_main)
    state = jax.jit(lambda p: init_train_state(p, opt))(params)
    step_fn = jax.jit(lambda st, b: sft_train_step(st, b, cfg, opt,
                                                   trainable_mask),
                      donate_argnums=(0,))
    loss_m = AverageMeter("loss", ":.4f")
    timer = StepTimer()
    os.makedirs(args.output_dir, exist_ok=True)
    log = open(os.path.join(args.output_dir, "metrics.jsonl"), "a")

    def _load_batch(idxs):
        return collate_fn([dataset[j] for j in idxs], tokenizer)

    # Per-epoch schedule, DistributedSampler(shuffle=True) equivalent
    # (the reference trains through HF Trainer, which shuffles every
    # epoch): a row permutation seeded by (data_seed, epoch) — a pure
    # function of those two, so a resumed run rebuilds epoch E's exact
    # stream and fast-forwards by an index slice — batched, truncated to
    # a common multiple of process_count (an unequal tail would leave one
    # host inside a collective the others left), strided per process.
    bs = args.per_device_batch_size
    nproc = jax.process_count()
    n_batches = len(dataset) // bs
    n_steps_epoch = n_batches // nproc
    shuffle = getattr(args, "shuffle", True)
    data_seed = getattr(args, "data_seed", 0)

    def epoch_batches(epoch):
        idx = list(range(len(dataset)))
        if shuffle:
            # tuple-of-int hash: PYTHONHASHSEED-independent, stable
            # across processes and runs
            random.Random(hash((data_seed, epoch))).shuffle(idx)
        rows = [tuple(idx[a * bs:(a + 1) * bs])
                for a in range(n_steps_epoch * nproc)]
        return rows[jax.process_index()::nproc]

    # step-granular auto-resume (HF Trainer resume_from_checkpoint
    # equivalent; the VSM trainer has the same scheme in train_vsm_main)
    latest_dir = os.path.join(args.output_dir, "ckpt_latest")
    save_steps = getattr(args, "save_steps", 0)
    start_epoch = start_step = 0
    if getattr(args, "auto_resume", False) and os.path.exists(
            os.path.join(latest_dir, "meta.json")):
        meta = json.load(open(os.path.join(latest_dir, "meta.json")))
        state = TrainState(*load_params(
            os.path.join(latest_dir, "state"), like=tuple(state)))
        start_epoch, start_step = meta["epoch"], meta["step"] + 1
        if start_step >= n_steps_epoch:
            start_epoch, start_step = start_epoch + 1, 0
        print(f"[resume] from epoch {meta['epoch']} step {meta['step']}")

    def _save_latest(epoch, step_i):
        os.makedirs(latest_dir, exist_ok=True)
        save_params(tuple(state), os.path.join(latest_dir, "state"))
        json.dump({"epoch": epoch, "step": step_i},
                  open(os.path.join(latest_dir, "meta.json"), "w"))

    with mesh:
        for epoch in range(start_epoch, args.num_train_epochs):
            epoch_start = start_step if epoch == start_epoch else 0
            # ordered parallel fetch+collate: image decode releases the
            # GIL, so worker threads overlap the device step
            # (HF Trainer DataLoader-workers equivalent)
            loader = prefetch_map(_load_batch,
                                  epoch_batches(epoch)[epoch_start:],
                                  workers=args.data_workers,
                                  depth=args.prefetch_depth)
            for step_i, batch in enumerate(loader, start=epoch_start):
                timer.data_loaded()
                state, m = step_fn(state, global_batch(batch, mesh))
                timer.step_done()
                loss_m.update(float(m["loss"]))
                i = epoch * n_steps_epoch + step_i
                if save_steps and (step_i + 1) % save_steps == 0 \
                        and step_i + 1 < n_steps_epoch:
                    _save_latest(epoch, step_i)
                if i % args.log_every == 0:
                    print(f"epoch {epoch} step {i} {loss_m} "
                          f"({timer.batch_time.avg:.2f}s/it)", flush=True)
                    log.write(json.dumps({"epoch": epoch, "step": i,
                                          "loss": loss_m.avg}) + "\n")
                    log.flush()
            if save_steps:
                # epoch-end save so a crash early next epoch never
                # replays this epoch's tail
                _save_latest(epoch, n_steps_epoch - 1)
    return state


def main(argv=None):
    args = parse_args(argv)
    from transformers import AutoTokenizer
    cfg = vqa_llm_7b()
    param_dtype = jnp.bfloat16 if args.param_dtype == "bf16" else jnp.float32

    if args.stage == "pretrain":
        from ..data.pretrain_dataset import (PretrainCaptionDataset,
                                             collate_pretrain)
        from ..models.vqa_llm import init_vqa_llm_params
        tokenizer = AutoTokenizer.from_pretrained(
            "lmsys/vicuna-7b-v1.5", use_fast=False)
        params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg,
                                     dtype=param_dtype)
        # the trained projector keeps f32 STORAGE (trivially small) so
        # the exported adapter is the exact accumulation, not a bf16
        # rounding of it — the frozen rest of the model stays bf16
        key = "proj_image" if args.projector == "linear" else "proj_object"
        params[key] = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), params[key])
        lr = args.learning_rate or (2e-3 if args.projector == "linear"
                                    else 2e-4)
        ds = PretrainCaptionDataset(args.data_path, args.image_folder,
                                    image_size=cfg.vision.image_size)

        def collate(instances, tok):
            return collate_pretrain(instances, tok,
                                    n_long=cfg.image_tokens_long,
                                    n_short=cfg.image_tokens_short,
                                    image_long=args.projector == "linear",
                                    seq_bucket=args.seq_bucket)

        state = run_training(args, cfg, params, ds, collate, tokenizer,
                             projector_only_mask(params, args.projector), lr)
        # adapter-only export (mm_projector.bin equivalent)
        key = "proj_image" if args.projector == "linear" else "proj_object"
        save_params(state.params[key],
                    os.path.join(args.output_dir, f"{key}_adapter"))
    else:
        from ..core.checkpoint import load_torch_dir
        from ..core.hf_config import vqa_llm_config_for
        from ..data.vqa_sft_dataset import (SearchInstructionDataset,
                                            collate_vqa_sft)
        from ..models.vqa_llm import vqa_llm_params_from_torch
        cfg = vqa_llm_config_for(args.model_path)
        tokenizer = AutoTokenizer.from_pretrained(args.model_path,
                                                  use_fast=False)
        params = vqa_llm_params_from_torch(load_torch_dir(args.model_path),
                                           cfg, dtype=param_dtype)
        ds = SearchInstructionDataset(args.data_path, args.image_folder,
                                      image_size=cfg.vision.image_size)

        def collate(instances, tok):
            return collate_vqa_sft(instances, tok,
                                   n_long=cfg.image_tokens_long,
                                   n_short=cfg.image_tokens_short,
                                   seq_bucket=args.seq_bucket)

        state = run_training(args, cfg, params, ds, collate, tokenizer,
                             frozen_vision_mask(params),
                             args.learning_rate)
        save_params(state.params, os.path.join(args.output_dir, "params"))


if __name__ == "__main__":
    main()
