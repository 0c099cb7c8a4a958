"""Multiple-choice scoring by per-option cross-entropy with prefix reuse.

Reference semantics (vstar_bench_eval.py:116-165): one forward over the
question keeps its KV cache; each option then runs a cached forward; the
option's score is the mean CE over its tokens, where the logit for the
first option token comes from the last question position. argmin wins.

TPU-native: the question prefill fills a ragged KVCache once; each option
is a chunked forward at q_offsets=prefix_len. Because JAX is functional,
every option reuses the same immutable prefix cache — no state rollback.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from ..nn.llama import KVCache, embed_tokens, llama_forward, lm_logits


def option_ce(params: Dict, cfg: LlamaConfig, cache: KVCache,
              last_logits: jnp.ndarray, option_ids: jnp.ndarray,
              option_lens: jnp.ndarray,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Mean CE of one option continuation.

    cache: prefix cache (length = prefix lens per row)
    last_logits: [B, vocab] logits at the last prefix position
    option_ids: [B, O] right-padded option tokens (no BOS)
    option_lens: [B] valid option lengths (>=1)
    Returns [B] mean cross-entropy.
    """
    B, O = option_ids.shape
    h = embed_tokens(params, option_ids, compute_dtype)
    pos = cache.length[:, None] + jnp.arange(O)[None]
    hidden, _ = llama_forward(
        params, cfg, h, pos, cache.length + option_lens,
        q_offsets=cache.length, cache=cache)
    chunk_logits = lm_logits(params, hidden)          # [B, O, V]

    # Logit that predicts option token i: last_logits for i=0, else
    # chunk_logits[i-1].
    pred_logits = jnp.concatenate(
        [last_logits[:, None], chunk_logits[:, :-1]], axis=1)
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(
        logp, option_ids[..., None].astype(jnp.int32), axis=-1)[..., 0]
    valid = (jnp.arange(O)[None] < option_lens[:, None]).astype(jnp.float32)
    ce = -(tok_logp * valid).sum(-1) / jnp.maximum(option_lens, 1)
    return ce


def score_options(params: Dict, cfg: LlamaConfig, cache: KVCache,
                  last_logits: jnp.ndarray, option_ids: jnp.ndarray,
                  option_lens: jnp.ndarray,
                  compute_dtype=jnp.bfloat16
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score N options against one shared prefix cache.

    option_ids: [B, N, O]; option_lens: [B, N].
    Returns (losses [B, N], best option index [B])."""
    N = option_ids.shape[1]
    losses = jnp.stack(
        [option_ce(params, cfg, cache, last_logits, option_ids[:, n],
                   option_lens[:, n], compute_dtype)
         for n in range(N)], axis=1)
    return losses, jnp.argmin(losses, axis=1)
