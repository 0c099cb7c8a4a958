"""Speculative decode must be bit-identical to greedy decode for ANY draft."""

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import _tiny_llama
from vstar_tpu.decode.sampler import greedy_decode
from vstar_tpu.decode.speculative import speculative_decode
from vstar_tpu.nn.llama import (embed_tokens, init_cache, init_llama_params,
                                llama_forward, lm_logits)

CFG = _tiny_llama()
PARAMS = init_llama_params(jax.random.PRNGKey(7), CFG)
EOS = 2
MAX_NEW = 12


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


def _check_equiv(draft_np, prompt):
    logits, hidden, cache = _prefill(prompt)
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    logits, hidden, cache = _prefill(prompt)
    spec = speculative_decode(PARAMS, CFG, cache, logits, hidden,
                              jnp.asarray(draft_np), MAX_NEW, [EOS],
                              chunk=4, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(spec.num_generated),
                                  np.asarray(ref.num_generated))
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(spec.cache.length),
                                  np.asarray(ref.cache.length))
    # hiddens match on the valid region
    for b in range(spec.tokens.shape[0]):
        n = int(spec.num_generated[b])
        np.testing.assert_allclose(np.asarray(spec.hiddens[b, :n]),
                                   np.asarray(ref.hiddens[b, :n]),
                                   rtol=3e-5, atol=3e-5)
    return ref, spec


def test_random_draft_equivalent():
    rng = np.random.RandomState(0)
    prompt = rng.randint(3, CFG.vocab_size, (2, 6))
    draft = rng.randint(3, CFG.vocab_size, (2, MAX_NEW + 4))
    _check_equiv(draft, prompt)


def test_perfect_draft_equivalent():
    rng = np.random.RandomState(1)
    prompt = rng.randint(3, CFG.vocab_size, (2, 5))
    logits, hidden, cache = _prefill(prompt)
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    # perfect draft: proposal i = generated token i+1
    draft = np.full((2, MAX_NEW + 4), EOS, np.int32)
    draft[:, :MAX_NEW - 1] = np.asarray(ref.tokens[:, 1:])
    _check_equiv(draft, prompt)


def test_forced_stop_equivalent():
    """Rig logits so the first token is EOS on row 0."""
    rng = np.random.RandomState(2)
    prompt = rng.randint(3, CFG.vocab_size, (2, 4))
    logits, hidden, cache = _prefill(prompt)
    rigged = np.asarray(logits).copy()
    rigged[0, :] = -1e9
    rigged[0, EOS] = 1e9
    draft = rng.randint(3, CFG.vocab_size, (2, MAX_NEW + 4))
    ref = greedy_decode(PARAMS, CFG, cache, jnp.asarray(rigged), hidden,
                        MAX_NEW, [EOS], compute_dtype=jnp.float32)
    logits, hidden, cache = _prefill(prompt)
    spec = speculative_decode(PARAMS, CFG, cache, jnp.asarray(rigged),
                              hidden, jnp.asarray(draft), MAX_NEW, [EOS],
                              chunk=4, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(spec.num_generated),
                                  np.asarray(ref.num_generated))
