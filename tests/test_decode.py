"""Decode engine + option scorer tests against full-recompute oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import _tiny_llama
from vstar_tpu.decode.sampler import greedy_decode
from vstar_tpu.decode.scorer import score_options
from vstar_tpu.nn.llama import (embed_tokens, init_cache, init_llama_params,
                                llama_forward, lm_logits)

CFG = _tiny_llama()
PARAMS = init_llama_params(jax.random.PRNGKey(7), CFG)
EOS = 2


def _full_logits(ids_np):
    ids = jnp.asarray(ids_np)
    B, S = ids.shape
    h = embed_tokens(PARAMS, ids, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    hidden, _ = llama_forward(PARAMS, CFG, h, pos,
                              jnp.full((B,), S, jnp.int32))
    return lm_logits(PARAMS, hidden), hidden


def _prefill(ids_np, cache_len=64):
    ids = jnp.asarray(ids_np)
    B, S = ids.shape
    cache = init_cache(CFG, B, cache_len, dtype=jnp.float32)
    h = embed_tokens(PARAMS, ids, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    lens = jnp.full((B,), S, jnp.int32)
    hidden, cache = llama_forward(PARAMS, CFG, h, pos, lens,
                                  q_offsets=jnp.zeros((B,), jnp.int32),
                                  cache=cache)
    logits = lm_logits(PARAMS, hidden)
    return logits[:, -1], hidden[:, -1], cache


def test_greedy_decode_matches_full_recompute():
    rng = np.random.RandomState(0)
    prompt = rng.randint(3, CFG.vocab_size, (2, 6))
    logits, hidden, cache = _prefill(prompt)
    max_new = 8
    res = greedy_decode(PARAMS, CFG, cache, logits, hidden, max_new, [EOS],
                        compute_dtype=jnp.float32)

    # Oracle: grow the sequence token by token with full recompute.
    want_rows = []
    for b in range(2):
        ids = list(prompt[b])
        toks = []
        for _ in range(max_new):
            full, _ = _full_logits(np.asarray([ids]))
            nxt = int(np.argmax(np.asarray(full[0, -1])))
            toks.append(nxt)
            ids.append(nxt)
            if nxt == EOS:
                break
        want_rows.append(toks)

    got = np.asarray(res.tokens)
    for b in range(2):
        n = int(res.num_generated[b])
        assert got[b, :n].tolist() == want_rows[b]

    # hidden[i] must equal the full-forward hidden that produced tokens[i]
    b = 0
    n = int(res.num_generated[b])
    ids_full = np.concatenate([prompt[b], got[b, :n]])[None]
    _, hid_full = _full_logits(ids_full)
    # token i (0-based in generated) was produced from position
    # len(prompt)-1+i of the full sequence
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(res.hiddens[b, i]),
            np.asarray(hid_full[0, prompt.shape[1] - 1 + i]),
            rtol=3e-5, atol=3e-5)


def test_score_options_matches_full_ce():
    rng = np.random.RandomState(1)
    B = 2
    prompt = rng.randint(3, CFG.vocab_size, (B, 5))
    opts = rng.randint(3, CFG.vocab_size, (B, 3, 4))
    opt_lens = np.array([[4, 2, 3], [1, 4, 2]], np.int32)

    last_logits, _, cache = _prefill(prompt)
    losses, best = score_options(PARAMS, CFG, cache, last_logits,
                                 jnp.asarray(opts), jnp.asarray(opt_lens),
                                 compute_dtype=jnp.float32)

    # Oracle: full forward over prompt+option, CE over option tokens
    # (vstar_bench_eval.py:140-161 semantics).
    for b in range(B):
        for n in range(3):
            L = opt_lens[b, n]
            ids = np.concatenate([prompt[b], opts[b, n, :L]])[None]
            full, _ = _full_logits(ids)
            lp = jax.nn.log_softmax(full[0].astype(jnp.float32), -1)
            ce = 0.0
            for i in range(L):
                pos = prompt.shape[1] - 1 + i
                ce -= float(lp[pos, opts[b, n, i]])
            ce /= L
            np.testing.assert_allclose(float(losses[b, n]), ce,
                                       rtol=1e-4, atol=1e-4)


def test_decode_stops_on_eos_padding_rows_frozen():
    """Rows that stop early must not grow their cache or change tokens."""
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, CFG.vocab_size, (2, 4))
    logits, hidden, cache = _prefill(prompt)
    # Force row 0 to emit EOS immediately by rigging its first logits.
    rigged = np.asarray(logits).copy()
    rigged[0, :] = -1e9
    rigged[0, EOS] = 1e9
    res = greedy_decode(PARAMS, CFG, cache, jnp.asarray(rigged), hidden,
                        6, [EOS], compute_dtype=jnp.float32)
    assert int(res.num_generated[0]) == 1
    assert int(res.tokens[0, 0]) == EOS
    assert (np.asarray(res.tokens[0, 1:]) == EOS).all()
    # the stop token is never consumed, so the row's cache did not grow
    assert int(res.cache.length[0]) == prompt.shape[1]
