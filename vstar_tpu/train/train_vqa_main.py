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

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import save_params
from ..core.config import vqa_llm_7b
from ..core.mesh import global_batch, make_mesh, shard_params
from ..core.params import map_with_path
from ..data.prefetch import prefetch_map
from ..utils.metrics import AverageMeter, StepTimer
from .sft import init_train_state, make_optimizer, sft_train_step


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

    def _load_batch(start):
        instances = [dataset[start + k]
                     for k in range(args.per_device_batch_size)]
        return collate_fn(instances, tokenizer)

    with mesh:
        i = 0
        for epoch in range(args.num_train_epochs):
            # multi-host: each process takes every process_count-th batch
            # (DistributedSampler equivalent); rows join the global batch
            # in global_batch below. Truncate to a common multiple so every
            # process runs the SAME number of steps — an unequal tail
            # would leave one host inside a collective the others left.
            starts = list(
                range(0, len(dataset) - args.per_device_batch_size + 1,
                      args.per_device_batch_size))
            nproc = jax.process_count()
            starts = starts[:len(starts) // nproc * nproc]
            starts = starts[jax.process_index()::nproc]
            # ordered parallel fetch+collate: image decode releases the
            # GIL, so worker threads overlap the device step
            # (HF Trainer DataLoader-workers equivalent)
            loader = prefetch_map(_load_batch, starts,
                                  workers=args.data_workers,
                                  depth=args.prefetch_depth)
            for batch in loader:
                timer.data_loaded()
                state, m = step_fn(state, global_batch(batch, mesh))
                timer.step_done()
                loss_m.update(float(m["loss"]))
                if i % args.log_every == 0:
                    print(f"epoch {epoch} step {i} {loss_m} "
                          f"({timer.batch_time.avg:.2f}s/it)", flush=True)
                    log.write(json.dumps({"epoch": epoch, "step": i,
                                          "loss": loss_m.avg}) + "\n")
                    log.flush()
                i += 1
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
