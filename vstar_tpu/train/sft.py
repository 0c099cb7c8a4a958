"""Supervised fine-tuning step for the VQA LLM (stage-2 of the reference's
pipeline, LLaVA/llava/train/train_search.py).

TPU-native replacement for HF Trainer + DeepSpeed ZeRO-2: a pjit-sharded
train step over a (data, fsdp, model) mesh. Parameters follow the regex
partition rules (core/mesh.py); optimizer state inherits the parameter
sharding (ZeRO-style); gradients reduce over data via XLA collectives
inserted by sharding propagation — no hand-written NCCL.

Loss: next-token CE with IGNORE_INDEX masking on the spliced sequence,
matching LlamaForCausalLM's shift-CE (llava_search_llama.py:94-105).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import VQALLMConfig
from ..core.mesh import DATA_AXIS
from ..models.vqa_llm import encode_feature_bank, spliced_embeds
from ..multimodal.constants import IGNORE_INDEX
from ..nn.llama import llama_forward, lm_logits


class TrainState(NamedTuple):
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(learning_rate: float = 2e-5, warmup_steps: int = 100,
                   total_steps: int = 10000, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999,
                   grad_clip: float = 1.0, trainable_mask=None,
                   master_f32: bool = False
                   ) -> optax.GradientTransformation:
    """AdamW + linear warmup / cosine decay (the reference uses HF defaults
    for the VQA LLM and WarmupDecayLR for the VSM; both are covered by
    optax schedules).

    trainable_mask: bool pytree — optimizer state (and f32 masters)
    allocate only for trainable leaves (optax.masked).
    master_f32: f32 master weights for bf16 parameter storage."""
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
    adamw = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    if master_f32:
        from .master import with_f32_master
        adamw = with_f32_master(adamw)
    if trainable_mask is not None:
        adamw = optax.masked(adamw, trainable_mask)
    return optax.chain(optax.clip_by_global_norm(grad_clip), adamw)


def sft_loss(params: Dict, cfg: VQALLMConfig, batch: Dict,
             compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """batch: image [B,H,W,3], objects [B,M,H,W,3], text_ids/feat_idx/
    is_feat [B,S], lens [B], labels [B,S] (IGNORE at prompts/feats/pad)."""
    # CLIP tower is frozen in every reference stage (pretrain trains the
    # projectors, finetune adds the LLM; train.py keeps the tower out of the
    # trainable set) — stop_gradient at the params so AD skips 24 tower
    # layers instead of computing gradients that the mask would zero.
    bank_params = dict(params,
                       vision=jax.lax.stop_gradient(params["vision"]))
    bank = encode_feature_bank(bank_params, cfg, batch["image"],
                               batch["objects"]).astype(compute_dtype)
    h = spliced_embeds(params, batch["text_ids"], bank, batch["feat_idx"],
                       batch["is_feat"], compute_dtype)
    B, S = batch["text_ids"].shape
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    hidden, _ = llama_forward(params["llama"], cfg.llama, h, pos,
                              batch["lens"],
                              kv_valid=batch.get("kv_valid"), remat=True)
    logits = lm_logits(params["llama"], hidden)

    # shift: logits[t] predicts labels[t+1]
    shift_logits = logits[:, :-1]
    shift_labels = batch["labels"][:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    return -(tok_lp * valid).sum() / n_valid


def sft_train_step(state: TrainState, batch: Dict, cfg: VQALLMConfig,
                   optimizer: optax.GradientTransformation,
                   trainable_mask: Optional[Dict] = None,
                   compute_dtype=jnp.bfloat16, grad_accum: int = 1
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SFT step. Freezing (e.g. the vision tower, frozen in the
    reference: clip_encoder requires_grad_(False)) is expressed with a
    trainable_mask pytree of booleans. grad_accum > 1 scans the batch in
    micro-slices (DeepSpeed-equivalent accumulation)."""
    from .accumulate import accumulated_grads
    loss, _, grads = accumulated_grads(
        lambda p, b: sft_loss(p, cfg, b, compute_dtype), state.params,
        batch, grad_accum)
    if trainable_mask is not None:
        # zero frozen-leaf grads WITHOUT changing dtype: an f32-cast mask
        # upcasts every bf16 grad leaf (+2 bytes/param live) — measured
        # 4.2-10.5 s/step (run-to-run HBM-pressure dependent) vs 0.10 s
        # on a near-full 16 GB v5e for the 2-layer full-width probe
        # (scripts/train_step_bench.py)
        grads = jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads,
            trainable_mask)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = {"loss": loss,
               "grad_norm": optax.global_norm(grads),
               "step": state.step}
    return TrainState(new_params, new_opt, state.step + 1), metrics


def init_train_state(params: Dict, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_frozen_vision_mask(params: Dict) -> Dict:
    """Mask freezing the CLIP tower (reference freezes it during SFT)."""
    from ..core.params import map_with_path
    return map_with_path(lambda path, _: not path.startswith("vision."),
                         params)


def shard_train_step(cfg: VQALLMConfig, optimizer, mesh,
                     compute_dtype=jnp.bfloat16):
    """jit the train step with explicit output shardings over `mesh`."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step_fn(state, batch):
        return sft_train_step(state, batch, cfg, optimizer,
                              compute_dtype=compute_dtype)

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step_fn,
                   in_shardings=(None, None),
                   donate_argnums=(0,)), batch_sharding
