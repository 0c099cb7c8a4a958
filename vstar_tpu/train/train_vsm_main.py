"""VSM training CLI — TPU-native counterpart of VisualSearch/train.py.

python -m vstar_tpu.train.train_vsm_main \\
    --version <hf seal/llava dir> --dataset_dir <base_image_dir> \\
    --log_base_dir ./runs --exp_name vsm

Replaces DeepSpeed ZeRO-2 + NCCL with a pjit-sharded step over a
(data, fsdp, model) mesh, Orbax checkpoints with auto-resume, and
best-det-acc checkpoint gating (train.py:389-411).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_params, save_params
from ..core.mesh import global_batch, make_mesh, shard_params
from ..data.prefetch import prefetch
from ..utils.metrics import AverageMeter, ProgressMeter, StepTimer
from .lora import add_lora, vsm_trainable_mask
from .vsm_train import (VSMLossWeights, VSMTrainState, make_vsm_optimizer,
                        vsm_train_step)


def parse_args(argv=None):
    p = argparse.ArgumentParser("vstar_tpu VSM training")
    p.add_argument("--version", default="craigwu/seal_vsm_7b")
    p.add_argument("--dataset_dir", default="./dataset")
    p.add_argument("--log_base_dir", default="./runs")
    p.add_argument("--exp_name", default="vsm")
    p.add_argument("--epochs", default=40, type=int)
    p.add_argument("--steps_per_epoch", default=2500, type=int)
    p.add_argument("--batch_size", default=4, type=int,
                   help="conversation rows per device per step")
    p.add_argument("--grad_accumulation_steps", default=2, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--ce_loss_weight", default=1.0, type=float)
    p.add_argument("--dice_loss_weight", default=0.5, type=float)
    p.add_argument("--bce_loss_weight", default=2.0, type=float)
    p.add_argument("--det_loss_weight", default=0.1, type=float)
    p.add_argument("--lora_r", default=8, type=int)
    p.add_argument("--lora_alpha", default=16, type=int)
    p.add_argument("--warmup_steps", default=100, type=int)
    p.add_argument("--seq_bucket", default=512, type=int)
    p.add_argument("--prefetch_depth", default=2, type=int,
                   help="batches decoded+collated ahead of the device "
                        "(DataLoader workers/prefetch equivalent)")
    p.add_argument("--mask_res", default=768, type=int,
                   help="fixed mask-loss resolution (gt resized on host, "
                        "pred upsampled; static shapes for jit)")
    p.add_argument("--mesh", default=None,
                   help="DxFxM mesh shape (data x fsdp x model), e.g. 1x8x1;"
                   " default: all devices on fsdp when >1 device")
    p.add_argument("--param_dtype", choices=["bf16", "f32"], default="bf16",
                   help="parameter storage dtype; bf16 + f32 masters in the"
                   " optimizer is the DeepSpeed-bf16-mode equivalent")
    p.add_argument("--hbm_gb", default=16.0, type=float,
                   help="per-chip HBM for the startup memory check")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--save_steps", default=500, type=int,
                   help="rolling 'latest' TrainState checkpoint every N "
                        "steps (0 disables); crash resume loses <= N "
                        "steps, like the reference's DeepSpeed 'latest' "
                        "global-step resume (train.py:333-350)")
    p.add_argument("--no_eval", action="store_true", default=False)
    p.add_argument("--dataset", default="general_segdet||refer_seg||"
                   "mixed_grounding||vqa")
    p.add_argument("--sample_rates", default="15,4,4,15")
    return p.parse_args(argv)


def build_datasets(args, tokenizer, clip_size: int = 224,
                   owl_size: int = 768):
    from ..data.vsm_datasets import (HybridDataset, MixedGroundingDataset,
                                     ReferSegDataset, SegDetDataset,
                                     VQADataset)
    names = args.dataset.split("||")
    rates = [float(r) for r in args.sample_rates.split(",")]
    children = []
    kept_rates = []
    ctor = {"general_segdet": SegDetDataset, "refer_seg": ReferSegDataset,
            "mixed_grounding": MixedGroundingDataset, "vqa": VQADataset}
    # per-process seed offset: in a multi-host run every process draws a
    # DIFFERENT sample stream (its rows join the global batch via
    # core.mesh.global_batch); same-seeded hosts would train dp-duplicated
    # batches.
    base_seed = 1000 * jax.process_index()
    for i, (name, rate) in enumerate(zip(names, rates)):
        try:
            children.append(ctor[name](args.dataset_dir,
                                       clip_size=clip_size,
                                       owl_size=owl_size,
                                       seed=base_seed + i))
            kept_rates.append(rate)
        except FileNotFoundError as e:
            print(f"[data] skipping {name}: {e}")
    if not children:
        raise FileNotFoundError("no datasets available under "
                                f"{args.dataset_dir}")
    return HybridDataset(children, kept_rates,
                         samples_per_epoch=args.steps_per_epoch
                         * args.batch_size * args.grad_accumulation_steps,
                         seed=base_seed + len(names))


def main(argv=None):
    args = parse_args(argv)

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.version, use_fast=False,
                                              model_max_length=512,
                                              padding_side="right")
    tokenizer.pad_token = tokenizer.unk_token
    loc_token_id = tokenizer("[LOC]",
                             add_special_tokens=False).input_ids[0]

    from ..core.hf_config import vsm_config_for
    cfg = vsm_config_for(args.version)
    from ..core.checkpoint import load_torch_dir
    from ..models.vsm import vsm_params_from_torch
    param_dtype = jnp.bfloat16 if args.param_dtype == "bf16" else jnp.float32
    params = vsm_params_from_torch(load_torch_dir(args.version), cfg,
                                   dtype=param_dtype)
    if args.lora_r > 0:
        params["llama"] = add_lora(params["llama"], jax.random.PRNGKey(0),
                                   r=args.lora_r, alpha=args.lora_alpha)
    return run_vsm_training(args, cfg, params, tokenizer, loc_token_id)


def run_vsm_training(args, cfg, params, tokenizer, loc_token_id):
    """The whole VSM training procedure after model construction: mesh +
    memory check, optimizer/LoRA masking, auto-resume, prefetched epochs,
    validation-gated checkpointing. Factored from main() so tiny-model
    tests can drive it end-to-end."""
    log_dir = os.path.join(args.log_base_dir, args.exp_name)
    os.makedirs(log_dir, exist_ok=True)
    from ..core.memory import check_memory, parse_mesh_arg, plan_train_memory
    mesh = make_mesh(parse_mesh_arg(args.mesh, len(jax.devices())))
    mask = vsm_trainable_mask(params)
    check_memory(plan_train_memory(params, mesh, trainable_mask=mask,
                                   master_f32=args.param_dtype == "bf16"),
                 hbm_gb=args.hbm_gb,
                 what=f"VSM train (mesh {dict(mesh.shape)})")
    params = shard_params(params, mesh)
    total_steps = args.epochs * args.steps_per_epoch
    opt = make_vsm_optimizer(args.lr, args.warmup_steps, total_steps,
                             trainable_mask=mask,
                             master_f32=args.param_dtype == "bf16")
    # init under jit so the optimizer state inherits the params' mesh
    # sharding (eager opt.init commits scalars to device 0, which then
    # conflicts with NamedSharding'd params inside the train step)
    state = jax.jit(lambda p: VSMTrainState(p, opt.init(p),
                                            jnp.zeros((), jnp.int32)))(params)

    ckpt_dir = os.path.join(log_dir, "ckpt_model")
    latest_dir = os.path.join(log_dir, "ckpt_latest")
    start_epoch = 0
    start_step = 0
    resumed_best = None
    if args.auto_resume:
        # prefer the rolling step-granular 'latest' over the epoch-gated
        # best checkpoint — a crash mid-epoch loses <= save_steps steps
        if os.path.exists(os.path.join(latest_dir, "meta.json")):
            meta = json.load(open(os.path.join(latest_dir, "meta.json")))
            state = VSMTrainState(*load_params(
                os.path.join(latest_dir, "state"), like=tuple(state)))
            start_epoch = meta["epoch"]
            start_step = meta["step"] + 1
            if start_step >= args.steps_per_epoch:
                start_epoch, start_step = start_epoch + 1, 0
            resumed_best = meta.get("best_det_acc")
            print(f"[resume] from epoch {meta['epoch']} "
                  f"step {meta['step']} (latest)")
        elif os.path.exists(os.path.join(ckpt_dir, "meta.json")):
            meta = json.load(open(os.path.join(ckpt_dir, "meta.json")))
            state = VSMTrainState(*load_params(
                os.path.join(ckpt_dir, "state"), like=tuple(state)))
            start_epoch = meta["epoch"] + 1
            resumed_best = meta.get("best_det_acc", meta.get("det_acc"))
            print(f"[resume] from epoch {meta['epoch']}")

    weights = VSMLossWeights(ce=args.ce_loss_weight,
                             dice=args.dice_loss_weight,
                             bce=args.bce_loss_weight,
                             det=args.det_loss_weight)
    step_fn = jax.jit(
        lambda st, b: vsm_train_step(st, b, cfg, opt, mask, weights,
                                     grad_accum=args.grad_accumulation_steps),
        donate_argnums=(0,))

    hybrid = build_datasets(args, tokenizer,
                            clip_size=cfg.vision.image_size,
                            owl_size=cfg.owl_vision.image_size)
    from ..data.vsm_collate import collate_vsm_rows
    meters = {k: AverageMeter(k, ":.4f") for k in
              ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss",
               "detection_loss")}
    timer = StepTimer()
    metrics_log = open(os.path.join(log_dir, "metrics.jsonl"), "a")
    tb = None
    try:  # TensorBoard scalars on rank 0 (train.py:126-130,520-548)
        from torch.utils.tensorboard import SummaryWriter
        if jax.process_index() == 0:
            tb = SummaryWriter(log_dir)
    except Exception:
        pass

    best_det_acc = -1.0 if resumed_best is None else resumed_best
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            epoch_start_step = start_step if epoch == start_epoch else 0
            gen = hybrid.batches(args.batch_size
                                 * args.grad_accumulation_steps,
                                 skip_batches=epoch_start_step,
                                 epoch=epoch)

            def _produce(g=gen):
                # sampling is seeded and stateful, so it stays serial; the
                # whole decode+collate pipeline runs off the step thread
                # (DataLoader-workers equivalent, train.py:70-75)
                for rows in g:
                    yield collate_vsm_rows(
                        rows, tokenizer, loc_token_id,
                        n_image_tokens=cfg.image_tokens,
                        seq_bucket=args.seq_bucket,
                        mask_res=args.mask_res)

            loader = prefetch(_produce(), depth=args.prefetch_depth)
            progress = ProgressMeter(args.steps_per_epoch,
                                     list(meters.values()),
                                     prefix=f"epoch {epoch} ")
            try:
                for step_i in range(epoch_start_step, args.steps_per_epoch):
                    batch = next(loader)
                    timer.data_loaded()
                    state, m = step_fn(state, global_batch(batch, mesh))
                    timer.step_done()
                    for k in meters:
                        meters[k].update(float(m[k]))
                    if args.save_steps and (step_i + 1) % args.save_steps \
                            == 0 and step_i + 1 < args.steps_per_epoch:
                        _save_latest(latest_dir, state, epoch, step_i,
                                     best_det_acc)
                    if step_i % 50 == 0:
                        line = progress.display(step_i)
                        metrics_log.write(json.dumps(
                            {"epoch": epoch, "step": step_i,
                             **{k: v.avg for k, v in meters.items()},
                             "secs_per_batch": timer.batch_time.avg}) + "\n")
                        metrics_log.flush()
                        if tb is not None:
                            gstep = epoch * args.steps_per_epoch + step_i
                            for k, m in meters.items():
                                tb.add_scalar(f"train/{k}", m.avg, gstep)
                            tb.add_scalar("metrics/total_secs_per_batch",
                                          timer.batch_time.avg, gstep)
            finally:
                loader.close()

            # checkpoint (best-det-acc gating when a val set exists)
            det_acc = None
            if not args.no_eval:
                try:
                    from ..data.val_dataset import ValDataset
                    from .validate import validate
                    from .vsm_train import vsm_val_forward
                    val_ds = ValDataset(args.dataset_dir,
                                        clip_size=cfg.vision.image_size,
                                        owl_size=cfg.owl_vision.image_size)
                    jfwd = jax.jit(
                        lambda p, b: vsm_val_forward(p, cfg, b))

                    def forward_fn(p, b):
                        jb = {k: jnp.asarray(v) for k, v in b.items()}
                        return jfwd(p, jb)

                    metrics_val = validate(
                        state.params, cfg,
                        val_ds.batches(tokenizer, loc_token_id,
                                       batch_size=args.batch_size,
                                       n_image_tokens=cfg.image_tokens,
                                       seq_bucket=args.seq_bucket),
                        forward_fn)
                    det_acc = metrics_val["det_acc"]
                    print(f"[val] epoch {epoch}: {metrics_val}", flush=True)
                except FileNotFoundError:
                    det_acc = None
            save = True if det_acc is None else det_acc > best_det_acc
            if save:
                if det_acc is not None:
                    best_det_acc = det_acc
                os.makedirs(ckpt_dir, exist_ok=True)
                save_params(tuple(state), os.path.join(ckpt_dir, "state"))
                json.dump({"epoch": epoch, "det_acc": det_acc,
                           "best_det_acc": best_det_acc},
                          open(os.path.join(ckpt_dir, "meta.json"), "w"))
            if args.save_steps:
                # epoch-end rolling save regardless of best-gating, so a
                # crash early next epoch never replays this epoch's tail
                _save_latest(latest_dir, state, epoch,
                             args.steps_per_epoch - 1, best_det_acc)
    return state


def _save_latest(latest_dir: str, state, epoch: int, step: int,
                 best_det_acc: float):
    os.makedirs(latest_dir, exist_ok=True)
    save_params(tuple(state), os.path.join(latest_dir, "state"))
    json.dump({"epoch": epoch, "step": step, "best_det_acc": best_det_acc},
              open(os.path.join(latest_dir, "meta.json"), "w"))


if __name__ == "__main__":
    main()
