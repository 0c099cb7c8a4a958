"""Jitted greedy decoding over the ragged KV cache, with per-step
hidden-state capture.

The reference decodes through HF `generate` — and the VSM even disables the
KV cache, recomputing the full sequence every step (VSM.py:151). Here the
decode loop is a `lax.while_loop` with static shapes: O(1) work per step,
early exit when every row has hit a stop token.

Hidden capture: `hiddens[i]` is the final-layer (post-norm) hidden state
that *produced* `tokens[i]` — exactly the state the reference gathers for
[LOC] heads (its mask selects the position before each [LOC]; VSM.py:465-473).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from ..nn.llama import KVCache, embed_tokens, llama_forward, lm_logits


def sample_token(logits: jnp.ndarray, key, temperature=0.0,
                 top_p=None) -> jnp.ndarray:
    """Greedy (temperature 0) or temperature/top-p sampling, matching the
    reference's generate flags (vstar_bench_eval.py:97-100: do_sample when
    temperature > 0). logits: [B, V] -> int32 [B].

    temperature/top_p may be Python floats (static: a greedy call costs
    one argmax and nothing else) or traced scalars (one compiled program
    serves every sampling value — serving must not recompile per
    temperature). A traced top_p >= 1 keeps every token (cum - probs < 1
    always), so 1.0 is the no-filter value."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    static_temp = isinstance(temperature, (int, float))
    if static_temp and temperature <= 0.0:
        return greedy
    temp = jnp.asarray(temperature, jnp.float32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6)
    # a STATIC top_p >= 1 skips the full-vocab sort/softmax/cumsum filter
    # entirely (it keeps everything — and exactly, where the cum-mass
    # comparison could round a tail token away); only a traced top_p pays
    # the filter unconditionally
    if top_p is not None and not (isinstance(top_p, (int, float))
                                  and top_p >= 1.0):
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        keep = cum - probs < jnp.asarray(top_p, jnp.float32)
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                         keepdims=True)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    if static_temp:
        return sampled
    return jnp.where(temp > 0.0, sampled, greedy)


class DecodeResult(NamedTuple):
    tokens: jnp.ndarray      # int32 [B, max_new] (padded with eos after stop)
    hiddens: jnp.ndarray     # [B, max_new, D] state that produced tokens[i]
    num_generated: jnp.ndarray  # int32 [B] tokens generated incl. stop token
    cache: KVCache
    # scalar int32: decoder forwards taken by the lockstep loop (greedy:
    # one per token after the first; speculative: one per verify chunk).
    # Speculative acceptance = (sum(num_generated) - B) / (B * n_forwards)
    # proposals accepted per forward — the day-one real-weight metric.
    n_forwards: Optional[jnp.ndarray] = None


def greedy_decode(params: Dict, cfg: LlamaConfig, cache: KVCache,
                  first_logits: jnp.ndarray, first_hidden: jnp.ndarray,
                  max_new_tokens: int, stop_ids: Sequence[int],
                  compute_dtype=jnp.bfloat16, temperature: float = 0.0,
                  top_p: Optional[float] = None,
                  rng_key=None) -> DecodeResult:
    """Decode after a prefill: greedy by default, temperature/top-p
    sampling when temperature > 0.

    first_logits: [B, vocab] logits at the last prompt position
    first_hidden: [B, D] hidden at the last prompt position
    stop_ids: token ids that terminate a row (e.g. eos '</s>').
    """
    B = first_logits.shape[0]
    D = first_hidden.shape[-1]
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    hiddens0 = jnp.zeros((B, max_new_tokens, D), first_hidden.dtype)

    rng_key, sub = jax.random.split(rng_key)
    tok0 = sample_token(first_logits, sub, temperature, top_p)
    tokens0 = tokens0.at[:, 0].set(tok0)
    hiddens0 = hiddens0.at[:, 0].set(first_hidden)
    done0 = jnp.isin(tok0, stop_arr)
    ngen0 = jnp.ones((B,), jnp.int32)

    def cond(state):
        t, done = state[0], state[4]
        return jnp.logical_and(t < max_new_tokens, ~jnp.all(done))

    def body(state):
        t, cache, tokens, hiddens, done, ngen, key = state
        cur_tok = jax.lax.dynamic_slice_in_dim(tokens, t - 1, 1, axis=1)
        h = embed_tokens(params, cur_tok, compute_dtype)
        pos = cache.length[:, None]
        new_lens = jnp.where(done, cache.length, cache.length + 1)
        hidden, new_cache = llama_forward(
            params, cfg, h, pos, cache.length + 1,
            q_offsets=cache.length, cache=cache)
        new_cache = new_cache._replace(length=new_lens)
        logits = lm_logits(params, hidden)[:, 0]
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, temperature, top_p)
        nxt = jnp.where(done, stop_arr[0], nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], t, axis=1)
        hiddens = jax.lax.dynamic_update_slice_in_dim(
            hiddens, hidden[:, 0][:, None].astype(hiddens.dtype), t, axis=1)
        new_done = jnp.logical_or(done, jnp.isin(nxt, stop_arr))
        ngen = jnp.where(done, ngen, ngen + 1)
        return (t + 1, new_cache, tokens, hiddens, new_done, ngen, key)

    state = (jnp.int32(1), cache, tokens0, hiddens0, done0, ngen0, rng_key)
    t, cache, tokens, hiddens, done, ngen, _ = jax.lax.while_loop(
        cond, body, state)
    # pad beyond each row's generation with the stop token. Without this
    # the tail is stop-token-padded only up to the step where the LAST
    # row finished (done rows emit stop_arr[0] while the loop runs) and
    # zero afterwards — making raw token arrays differ from
    # speculative/lookup decode's, which pad the whole tail (the
    # bit-identical contract is on the full array, not just [:ngen]).
    pos_ids = jnp.arange(max_new_tokens)[None]
    tokens = jnp.where(pos_ids < ngen[:, None], tokens, stop_arr[0])
    return DecodeResult(tokens=tokens, hiddens=hiddens, num_generated=ngen,
                        cache=cache, n_forwards=t - 1)
