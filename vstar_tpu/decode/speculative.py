"""Speculative decoding (greedy-equivalent): template drafts and
prompt-lookup drafts.

Decode is weight-bandwidth-bound — each greedy step re-reads the whole
decoder. Draft-and-verify turns K decode steps into one chunked forward:
feed the last emitted token plus K-1 draft tokens at the cache frontier
(per-row q_offsets), take argmax at every position, and accept the longest
prefix where the draft matched. Every emitted token is exactly what greedy
decoding would have produced (the first mismatching position still yields
one valid token), so outputs are bit-identical to `greedy_decode` for ANY
draft; a good draft just gets there in fewer forwards.

Two draft sources share one verify loop (`_spec_loop`):

  * `speculative_decode` — a STATIC per-row draft sequence, supplied at
    dispatch. Used on the VSM search path, whose answers are nearly
    deterministic templates ("Sure, [LOC].</s>").
  * `lookup_decode` — PROMPT-LOOKUP drafts retrieved in-graph each
    chunk: the last bigram (fallback: unigram) of the running sequence
    is matched against a context buffer holding the prompt tokens plus
    everything generated so far, and the continuation after the most
    recent match becomes the draft (the n-gram "prompt lookup decoding"
    technique; the reference has no speculation at all —
    vstar_bench_eval.py:78-114 decodes greedily). No template needed, so
    it covers free-form VQA answers, which often echo question spans.
    The lookup is O(C) elementwise work per chunk — noise next to a 7B
    forward.

Per-step hidden states are captured like greedy_decode: hiddens[i] is the
state that produced tokens[i] (what the [LOC] heads consume).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from ..nn.llama import KVCache, embed_tokens, llama_forward, lm_logits
from .sampler import DecodeResult


def _spec_loop(params: Dict, cfg: LlamaConfig, cache: KVCache,
               first_logits: jnp.ndarray, first_hidden: jnp.ndarray,
               max_new_tokens: int, stop_ids: Sequence[int], chunk: int,
               compute_dtype, draft_fn, aux0, aux_update):
    """The shared draft-and-verify loop.

    draft_fn(aux, ngen, feed) -> [B, chunk-1] lookahead proposals.
    aux_update(aux, g, ngen, emit, done) -> aux' runs after each verify
    (e.g. append the emitted tokens to a lookup buffer); `g` is the
    [B, chunk] verified greedy tokens, `emit` how many of them each row
    emitted this iteration (0 for frozen rows).

    CACHE CAPACITY: every iteration writes `chunk` KV entries at the
    frontier even when fewer are accepted, so the cache must hold at
    least prompt_len + max_new_tokens + chunk - 2 entries — callers add
    spec_chunk before rounding (a bucket-filling prompt at a
    128-multiple max_new_tokens otherwise clamps the last inserts onto
    valid entries: silent corruption, not an error)."""
    B = first_logits.shape[0]
    D = first_hidden.shape[-1]
    K = chunk
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    hiddens0 = jnp.zeros((B, max_new_tokens, D), first_hidden.dtype)
    tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    hiddens0 = hiddens0.at[:, 0].set(first_hidden)
    done0 = jnp.isin(tok0, stop_arr)
    ngen0 = jnp.ones((B,), jnp.int32)
    aux0 = aux_update(aux0, jnp.zeros((B, K), jnp.int32).at[:, 0].set(tok0),
                      jnp.zeros((B,), jnp.int32),
                      jnp.ones((B,), jnp.int32), done0)

    def cond(state):
        ngen, done = state[3], state[4]
        return jnp.logical_and(~jnp.all(done),
                               jnp.any(ngen < max_new_tokens))

    def body(state):
        cache, tokens, hiddens, ngen, done, feed, nfwd, aux = state

        lookahead = draft_fn(aux, ngen, feed)               # [B, K-1]
        chunk_ids = jnp.concatenate([feed[:, None], lookahead], axis=1)

        h = embed_tokens(params, chunk_ids, compute_dtype)
        pos = cache.length[:, None] + jnp.arange(K)[None]
        hidden, new_cache = llama_forward(
            params, cfg, h, pos, cache.length + K,
            q_offsets=cache.length, cache=cache)
        logits = lm_logits(params, hidden)                  # [B, K, V]
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B, K]

        # matches[i] (i in 0..K-2): lookahead[i] == g[i]
        matches = lookahead == g[:, :K - 1]
        # m = length of leading all-true prefix
        m = jnp.sum(jnp.cumprod(matches.astype(jnp.int32), axis=1), axis=1)
        emit = m + 1                                        # tokens emitted

        # stop handling: truncate at the first stop token among g[:emit]
        idx = jnp.arange(K)[None]
        is_stop = jnp.isin(g, stop_arr) & (idx < emit[:, None])
        any_stop = jnp.any(is_stop, axis=1)
        first_stop = jnp.argmax(is_stop, axis=1)
        emit = jnp.where(any_stop, first_stop + 1, emit)

        # clamp to budget and freeze finished rows
        budget = max_new_tokens - ngen
        emit = jnp.minimum(emit, budget)
        emit = jnp.where(done, 0, emit)

        # scatter emitted tokens/hiddens at per-row offsets
        def scatter_row(tok_row, hid_row, g_row, h_row, n, e):
            width = jnp.arange(K)
            sel = width < e
            # positions n..n+e-1 receive g_row[0..e-1]
            pos_ids = n + width
            tok_row = tok_row.at[jnp.where(sel, pos_ids,
                                           max_new_tokens)].set(
                jnp.where(sel, g_row, 0), mode="drop")
            hid_row = hid_row.at[jnp.where(sel, pos_ids,
                                           max_new_tokens)].set(
                jnp.where(sel[:, None], h_row, 0), mode="drop")
            return tok_row, hid_row

        tokens, hiddens = jax.vmap(scatter_row)(
            tokens, hiddens, g, hidden.astype(hiddens.dtype), ngen, emit)

        # cache validity: feed + matched drafts consumed = emit entries,
        # except the one holding the (unconsumed) next feed token
        consumed = jnp.where(done, 0, jnp.minimum(emit, m + 1))
        new_len = cache.length + consumed
        new_cache = new_cache._replace(length=new_len)

        last_idx = jnp.clip(emit - 1, 0, K - 1)
        new_feed = jnp.where(
            emit > 0, jnp.take_along_axis(g, last_idx[:, None], 1)[:, 0],
            feed)
        stopped = jnp.any(is_stop & (idx < emit[:, None]), axis=1)
        new_done = done | stopped | (ngen + emit >= max_new_tokens)
        aux = aux_update(aux, g, ngen, emit, done)
        ngen = ngen + emit
        return (new_cache, tokens, hiddens, ngen, new_done, new_feed,
                nfwd + 1, aux)

    state = (cache, tokens0, hiddens0, ngen0, done0, tok0,
             jnp.int32(0), aux0)
    cache, tokens, hiddens, ngen, done, _, nfwd, _ = jax.lax.while_loop(
        cond, body, state)

    # pad beyond each row's generation with the stop token (greedy_decode
    # contract)
    pos_ids = jnp.arange(max_new_tokens)[None]
    tokens = jnp.where(pos_ids < ngen[:, None], tokens, stop_arr[0])
    return DecodeResult(tokens=tokens, hiddens=hiddens, num_generated=ngen,
                        cache=cache, n_forwards=nfwd)


def speculative_decode(params: Dict, cfg: LlamaConfig, cache: KVCache,
                       first_logits: jnp.ndarray, first_hidden: jnp.ndarray,
                       draft: jnp.ndarray, max_new_tokens: int,
                       stop_ids: Sequence[int], chunk: int = 8,
                       compute_dtype=jnp.bfloat16) -> DecodeResult:
    """Greedy-equivalent decode with a STATIC per-row draft sequence.

    draft: int32 [B, max_new_tokens + chunk] proposed continuations
    (draft[b, i] is the proposal for the (i+1)-th generated token; the
    first generated token comes straight from first_logits, as in
    greedy_decode). Pad arbitrarily — padding just means rejections.
    """
    K = chunk
    draft = draft.astype(jnp.int32)

    def draft_fn(aux, ngen, feed):
        # lookahead[i] is verified against generated token ngen+i, and
        # draft[j] proposes generated token j (the engines store the
        # expected answer tokens UNSHIFTED; draft[0] aligns with the free
        # first token and is never read) — so the slice starts at ngen.
        # Slicing at ngen-1 instead compares every proposal against the
        # NEXT token: acceptance only on repeated tokens, which random-
        # weight benches emit constantly but real checkpoints don't (the
        # r3 review caught template speculation silently doing nothing on
        # non-repetitive answers).
        def row_chunk(dr, n):
            return jax.lax.dynamic_slice(dr, (n,), (K - 1,))
        return jax.vmap(row_chunk)(draft, ngen)

    return _spec_loop(params, cfg, cache, first_logits, first_hidden,
                      max_new_tokens, stop_ids, K, compute_dtype,
                      draft_fn, (), lambda aux, g, n, e, d: aux)


def lookup_decode(params: Dict, cfg: LlamaConfig, cache: KVCache,
                  first_logits: jnp.ndarray, first_hidden: jnp.ndarray,
                  ctx_ids: jnp.ndarray, ctx_len: jnp.ndarray,
                  max_new_tokens: int, stop_ids: Sequence[int],
                  chunk: int = 8,
                  compute_dtype=jnp.bfloat16) -> DecodeResult:
    """Greedy-equivalent decode with PROMPT-LOOKUP drafts.

    Each chunk, the draft for a row is retrieved from a context buffer
    holding `ctx_ids[:ctx_len]` (the prompt's text tokens; mask non-text
    slots to -1 so image-feature placeholders never match) followed by
    every token generated so far: find the EARLIEST position whose
    trailing trigram/bigram/unigram (longest order first) equals the
    row's last tokens — no match just means K-1 rejected proposals,
    i.e. greedy pace — and propose the K-1 tokens that followed it.
    Earliest-match matters: inside a run of repeated tokens the most
    recent match sits at the run's end and its continuation skips the
    run, while the earliest match replays it (measured 7.4 -> 2.3
    ms/token on the oracle case at 7B). Self-matches against the
    still-growing tail are excluded.

    ctx_ids: int32 [B, C]; ctx_len: int32 [B]. Output is bit-identical
    to greedy_decode; acceptance (and therefore speed) depends on how
    much of the answer echoes the prompt or repeats itself.
    """
    B, C = ctx_ids.shape
    K = chunk
    # buffer: prompt tokens then generated tokens, padded so a
    # dynamic_slice of K-1 starting anywhere below blen stays in-bounds
    W = C + max_new_tokens + K
    buf0 = jnp.full((B, W), -1, jnp.int32)
    buf0 = jax.lax.dynamic_update_slice(buf0, ctx_ids.astype(jnp.int32),
                                        (0, 0))
    blen0 = ctx_len.astype(jnp.int32)

    def draft_fn(aux, ngen, feed):
        buf, blen = aux

        def row(buf_row, bl, fd):
            j = jnp.arange(W)
            prev = buf_row[jnp.clip(bl - 2, 0, W - 1)]
            prev2 = buf_row[jnp.clip(bl - 3, 0, W - 1)]
            s1 = jnp.roll(buf_row, 1)               # s1[j] = buf[j-1]
            s2 = jnp.roll(buf_row, 2)               # s2[j] = buf[j-2]
            # n-gram ends at j: continuation starts at j+1, and must be
            # strictly before the sequence tail (j < bl-1) so we never
            # propose the feed token to itself
            ok = (j < bl - 1) & (buf_row == fd)
            m1 = ok & (j >= 1)
            m2 = m1 & (s1 == prev) & (bl >= 2)
            m3 = m2 & (j >= 2) & (s2 == prev2) & (bl >= 3)
            # EARLIEST match of the LONGEST matching order (see
            # docstring: recency mis-drafts inside repeated runs)
            j3 = jnp.min(jnp.where(m3, j, W))
            j2 = jnp.min(jnp.where(m2, j, W))
            j1 = jnp.min(jnp.where(m1, j, W))
            best = jnp.where(j3 < W, j3, jnp.where(j2 < W, j2, j1))
            hit = best < W
            start = jnp.where(hit, best + 1, 0)
            cont = jax.lax.dynamic_slice(buf_row, (start,), (K - 1,))
            # no match -> -1 proposals (guaranteed rejections)
            return jnp.where(hit, cont, -1)

        return jax.vmap(row)(buf, blen, feed)

    def aux_update(aux, g, ngen, emit, done):
        buf, blen = aux

        def row(buf_row, bl, g_row, e):
            width = jnp.arange(K)
            sel = width < e
            pos_ids = bl + width
            return buf_row.at[jnp.where(sel, pos_ids, W)].set(
                jnp.where(sel, g_row, 0), mode="drop")

        buf = jax.vmap(row)(buf, blen, g, emit)
        return buf, blen + emit

    return _spec_loop(params, cfg, cache, first_logits, first_hidden,
                      max_new_tokens, stop_ids, K, compute_dtype,
                      draft_fn, (buf0, blen0), aux_update)
