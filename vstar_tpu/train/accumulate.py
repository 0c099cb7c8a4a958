"""Gradient accumulation: micro-batch scan inside one jitted step.

The reference accumulates through DeepSpeed (grad_accumulation_steps=2 for
the VSM, VisualSearch/train.py:67-70; HF Trainer for the VQA LLM). Here a
batch whose leading dim is (micro * micro_bs) is scanned in `micro` slices
and the mean gradient applied once — same memory profile as a small batch,
same update as a big one."""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def accumulated_grads(loss_fn: Callable, params, batch: Dict,
                      num_micro: int, has_aux: bool = False):
    """loss_fn(params, micro_batch) -> loss (or (loss, aux)).

    Every leaf of `batch` must have leading dim divisible by num_micro.
    Returns (loss, aux_or_None, grads) averaged over micro-batches."""
    if num_micro <= 1:
        if has_aux:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            return loss, aux, grads
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        return loss, None, grads

    def reshape(x):
        return x.reshape((num_micro, x.shape[0] // num_micro) + x.shape[1:])

    micro = jax.tree_util.tree_map(reshape, batch)

    def body(carry, mb):
        loss_acc, aux_acc, grads_acc = carry
        if has_aux:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb)
            aux_acc = jax.tree_util.tree_map(
                lambda a, b: a + b / num_micro, aux_acc, aux)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
        grads_acc = jax.tree_util.tree_map(
            lambda a, g: a + g / num_micro, grads_acc, grads)
        return (loss_acc + loss / num_micro, aux_acc, grads_acc), None

    zeros_like_f32 = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else jnp.zeros(p.shape, p.dtype), params)
    aux0 = None
    if has_aux:
        first = jax.tree_util.tree_map(lambda x: x[0], micro)
        _, aux_shape = jax.eval_shape(loss_fn, params, first)
        aux0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, jnp.float32), aux_shape)
    (loss, aux, grads), _ = jax.lax.scan(
        body, (jnp.float32(0.0), aux0, zeros_like_f32), micro)
    return loss, aux, grads
