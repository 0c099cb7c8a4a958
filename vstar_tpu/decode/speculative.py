"""Template speculative decoding (greedy-equivalent).

The VSM's search-mode answers are nearly deterministic templates
("Sure, [LOC].</s>"), and decode is weight-bandwidth-bound — each greedy
step re-reads the whole decoder. Draft-and-verify turns K decode steps into
one chunked forward: feed the last emitted token plus K-1 draft tokens at
the cache frontier (per-row q_offsets), take argmax at every position, and
accept the longest prefix where the draft matched. Every emitted token is
exactly what greedy decoding would have produced (the first mismatching
position still yields one valid token), so outputs are bit-identical to
`greedy_decode` for any draft; a good draft just gets there in fewer
forwards.

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


def speculative_decode(params: Dict, cfg: LlamaConfig, cache: KVCache,
                       first_logits: jnp.ndarray, first_hidden: jnp.ndarray,
                       draft: jnp.ndarray, max_new_tokens: int,
                       stop_ids: Sequence[int], chunk: int = 8,
                       compute_dtype=jnp.bfloat16) -> DecodeResult:
    """Greedy-equivalent decode with a per-row draft sequence.

    draft: int32 [B, max_new_tokens + chunk] proposed continuations
    (draft[b, i] is the proposal for the (i+1)-th generated token; the
    first generated token comes straight from first_logits, as in
    greedy_decode). Pad arbitrarily — padding just means rejections.
    """
    B = first_logits.shape[0]
    D = first_hidden.shape[-1]
    K = chunk
    stop_arr = jnp.asarray(list(stop_ids), jnp.int32)
    draft = draft.astype(jnp.int32)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    hiddens0 = jnp.zeros((B, max_new_tokens, D), first_hidden.dtype)
    tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    hiddens0 = hiddens0.at[:, 0].set(first_hidden)
    done0 = jnp.isin(tok0, stop_arr)
    ngen0 = jnp.ones((B,), jnp.int32)

    def cond(state):
        ngen, done = state[3], state[4]
        return jnp.logical_and(~jnp.all(done),
                               jnp.any(ngen < max_new_tokens))

    def body(state):
        cache, tokens, hiddens, ngen, done, feed = state

        # per-row chunk: [feed, draft[ngen-1], ..., draft[ngen+K-3]]
        def row_chunk(dr, n):
            lookahead = jax.lax.dynamic_slice(dr, (n - 1,), (K - 1,))
            return lookahead
        lookahead = jax.vmap(row_chunk)(draft, ngen)        # [B, K-1]
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
        ngen = ngen + emit
        return (new_cache, tokens, hiddens, ngen, new_done, new_feed)

    state = (cache, tokens0, hiddens0, ngen0, done0, tok0)
    cache, tokens, hiddens, ngen, done, _ = jax.lax.while_loop(
        cond, body, state)

    # pad beyond each row's generation with the stop token (greedy_decode
    # contract)
    pos_ids = jnp.arange(max_new_tokens)[None]
    tokens = jnp.where(pos_ids < ngen[:, None], tokens, stop_arr[0])
    return DecodeResult(tokens=tokens, hiddens=hiddens, num_generated=ngen,
                        cache=cache)
