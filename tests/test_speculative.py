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
    """A draft row holding the answer tokens UNSHIFTED (draft[i] proposes
    generated token i — exactly how the engines store template rows and
    how bench.py's probe stores the model's own greedy answer) must be
    both bit-identical to greedy AND nearly fully accepted. The
    acceptance assertion is the teeth: an off-by-one draft slice stays
    bit-identical (verify fixes every mismatch) but silently decodes at
    greedy pace (r3 review)."""
    rng = np.random.RandomState(1)
    prompt = rng.randint(3, CFG.vocab_size, (2, 5))
    logits, hidden, cache = _prefill(prompt)
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    draft = np.full((2, MAX_NEW + 4), EOS, np.int32)
    draft[:, :MAX_NEW] = np.asarray(ref.tokens)
    _, spec = _check_equiv(draft, prompt)
    # chunk=4: every forward emits feed + up to 3 accepted proposals
    n_max = int(np.asarray(ref.num_generated).max())
    assert int(spec.n_forwards) <= int(np.ceil((n_max - 1) / 4)), (
        int(spec.n_forwards), n_max)


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


def test_spec_minimum_cache_capacity():
    """The documented capacity floor (prompt + max_new + chunk - 2) is
    sufficient: a zero-acceptance draft maximizes iterations, pushing the
    chunk-wide KV writes to the cache's very last entry. With only
    prompt + max_new entries (what greedy needs) those writes clamp onto
    valid KV and corrupt the tail tokens — the callers' + spec_chunk
    headroom exists exactly for this."""
    rng = np.random.RandomState(8)
    S = 6
    prompt = rng.randint(3, CFG.vocab_size, (1, S))
    logits, hidden, cache = _prefill(prompt)        # roomy reference
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    never = jnp.full((1, MAX_NEW + 4), -1, jnp.int32)
    cap = S + MAX_NEW + 4 - 2                       # exact minimum
    logits, hidden, cache = _prefill(prompt, cache_len=cap)
    spec = speculative_decode(PARAMS, CFG, cache, logits, hidden, never,
                              MAX_NEW, [EOS], chunk=4,
                              compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(spec.num_generated),
                                  np.asarray(ref.num_generated))


# -- prompt-lookup drafts ----------------------------------------------------

from vstar_tpu.decode.speculative import lookup_decode  # noqa: E402


def _check_lookup_equiv(prompt, ctx=None, ctx_len=None, chunk=4):
    logits, hidden, cache = _prefill(prompt)
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    logits, hidden, cache = _prefill(prompt)
    if ctx is None:
        ctx = prompt
    if ctx_len is None:
        ctx_len = np.full((prompt.shape[0],), ctx.shape[1], np.int32)
    spec = lookup_decode(PARAMS, CFG, cache, logits, hidden,
                         jnp.asarray(ctx, jnp.int32),
                         jnp.asarray(ctx_len, jnp.int32), MAX_NEW, [EOS],
                         chunk=chunk, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(spec.num_generated),
                                  np.asarray(ref.num_generated))
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(spec.cache.length),
                                  np.asarray(ref.cache.length))
    for b in range(spec.tokens.shape[0]):
        n = int(spec.num_generated[b])
        np.testing.assert_allclose(np.asarray(spec.hiddens[b, :n]),
                                   np.asarray(ref.hiddens[b, :n]),
                                   rtol=3e-5, atol=3e-5)
    return ref, spec


def test_lookup_equivalent_random_prompts():
    """Bit-equality with greedy for arbitrary contexts (matches are
    essentially spurious on a random model -> mostly rejections)."""
    rng = np.random.RandomState(3)
    for trial in range(3):
        prompt = rng.randint(3, CFG.vocab_size, (2, 5 + trial))
        _check_lookup_equiv(prompt, chunk=3 + trial)


def test_lookup_equivalent_answer_in_context():
    """The greedy continuation placed INSIDE the context (the prompt-echo
    case lookup is built for): still bit-identical — and the bigram
    retrieval actually proposes it (high acceptance exercised, not just
    the all-reject path)."""
    rng = np.random.RandomState(4)
    prompt = rng.randint(3, CFG.vocab_size, (2, 6))
    logits, hidden, cache = _prefill(prompt)
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    toks = np.asarray(ref.tokens)
    # context = [prompt tail token, full greedy answer, padding]
    C = prompt.shape[1] + MAX_NEW + 2
    ctx = np.full((2, C), -1, np.int32)
    lens = np.zeros((2,), np.int32)
    for b in range(2):
        row = list(prompt[b]) + [int(t) for t in
                                 toks[b, :int(ref.num_generated[b])]]
        ctx[b, :len(row)] = row
        lens[b] = len(row)
    _check_lookup_equiv(prompt, ctx=ctx, ctx_len=lens)


def test_lookup_equivalent_repetitive_prompt():
    """Repeating-token prompts create many n-gram matches incl. ties —
    the earliest-longest-match rule must stay greedy-equivalent."""
    rng = np.random.RandomState(5)
    base = rng.randint(3, CFG.vocab_size, (1, 3))
    prompt = np.concatenate([base, base, base], axis=1)
    prompt = np.concatenate([prompt, prompt], axis=0)
    _check_lookup_equiv(prompt, chunk=4)


def test_lookup_masked_context_slots():
    """-1 (masked non-text) context slots must never be proposed as
    drafts — equivalence with a context that is mostly mask."""
    rng = np.random.RandomState(6)
    prompt = rng.randint(3, CFG.vocab_size, (2, 6))
    C = 24
    ctx = np.full((2, C), -1, np.int32)
    ctx[:, 4:10] = prompt
    lens = np.full((2,), 10, np.int32)
    _check_lookup_equiv(prompt, ctx=ctx, ctx_len=lens)


def test_engine_prompt_lookup_matches_greedy():
    """VQAEngine(prompt_lookup=True): free_form and free_form_many return
    exactly the default greedy text (lookup only changes speed)."""
    from PIL import Image

    from vstar_tpu.core.config import vqa_llm_tiny
    from vstar_tpu.eval.vqa_engine import VQAEngine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from tests.test_data import WordTokenizer

    cfg = vqa_llm_tiny()
    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg)
    tok = WordTokenizer()

    def make(**kw):
        return VQAEngine(params, cfg, tok, prompt_buckets=(64, 128),
                         option_bucket=16, compute_dtype=jnp.float32,
                         **kw)

    plain = make()
    plain._spec_template = None          # pure greedy baseline
    #          (the constructor swaps None for the default template)
    lk = make(prompt_lookup=True)

    rng = np.random.RandomState(0)
    imgs = [Image.fromarray((rng.rand(64, 80, 3) * 255).astype("uint8"))
            for _ in range(2)]
    qs = ["what color is the cup ?", "where is the dog ?"]
    for im, q in zip(imgs, qs):
        a = plain.free_form(im, q, max_new_tokens=6)
        b = lk.free_form(im, q, max_new_tokens=6)
        assert a == b, (q, a, b)
    assert (lk.free_form_many(imgs, qs, max_new_tokens=6)
            == plain.free_form_many(imgs, qs, max_new_tokens=6))
    # acceptance stats recorded (the day-one real-weight metric)
    st = lk.last_decode_stats
    assert st is not None and st["forwards"] >= 1
    assert 0.0 <= st["tokens_per_forward"] <= 6


def test_n_forwards_counts_acceptance():
    """DecodeResult.n_forwards: greedy takes one forward per token after
    the first; an oracle-context lookup takes far fewer (accepted
    proposals); an impossible static draft takes exactly as many chunk
    forwards as greedy takes steps."""
    rng = np.random.RandomState(7)
    prompt = rng.randint(3, CFG.vocab_size, (2, 6))

    logits, hidden, cache = _prefill(prompt)
    ref = greedy_decode(PARAMS, CFG, cache, logits, hidden, MAX_NEW, [EOS],
                        compute_dtype=jnp.float32)
    g_fwd = int(ref.n_forwards)
    assert g_fwd == int(np.asarray(ref.num_generated).max()) - 1

    never = jnp.full((2, MAX_NEW + 4), -1, jnp.int32)
    logits, hidden, cache = _prefill(prompt)
    rej = speculative_decode(PARAMS, CFG, cache, logits, hidden, never,
                             MAX_NEW, [EOS], chunk=4,
                             compute_dtype=jnp.float32)
    assert int(rej.n_forwards) == g_fwd   # zero acceptance = greedy pace

    toks = np.asarray(ref.tokens)
    C = prompt.shape[1] + MAX_NEW + 2
    ctx = np.full((2, C), -1, np.int32)
    lens = np.zeros((2,), np.int32)
    for b in range(2):
        row = list(prompt[b]) + [int(t) for t in
                                 toks[b, :int(ref.num_generated[b])]]
        ctx[b, :len(row)] = row
        lens[b] = len(row)
    logits, hidden, cache = _prefill(prompt)
    spec = lookup_decode(PARAMS, CFG, cache, logits, hidden,
                         jnp.asarray(ctx), jnp.asarray(lens), MAX_NEW,
                         [EOS], chunk=4, compute_dtype=jnp.float32)
    assert int(spec.n_forwards) < g_fwd / 2, (
        int(spec.n_forwards), g_fwd)
