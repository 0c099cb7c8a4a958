"""LLaMA decoder unit tests: shapes, cache-consistency, HF parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstar_tpu.core.config import _tiny_llama
from vstar_tpu.nn.llama import (KVCache, embed_tokens, init_cache,
                                init_llama_params, llama_forward, lm_logits)

CFG = _tiny_llama()


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(1), CFG)


def test_forward_shapes(params):
    B, S = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, CFG.vocab_size)
    h = embed_tokens(params, ids, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    lens = jnp.array([16, 10], jnp.int32)
    out, cache = llama_forward(params, CFG, h, pos, lens)
    assert out.shape == (B, S, CFG.hidden_size)
    assert cache is None
    logits = lm_logits(params, out)
    assert logits.shape == (B, S, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits[0])).all()


def test_prefill_then_decode_matches_full_forward(params):
    """Cached decode must produce the same logits as a full forward."""
    B, S_total, S_prefix = 2, 12, 8
    key = jax.random.PRNGKey(3)
    ids = jax.random.randint(key, (B, S_total), 0, CFG.vocab_size)
    h_full = embed_tokens(params, ids, jnp.float32)
    pos_full = jnp.broadcast_to(jnp.arange(S_total), (B, S_total))
    full_lens = jnp.full((B,), S_total, jnp.int32)
    out_full, _ = llama_forward(params, CFG, h_full, pos_full, full_lens)

    # Prefill the first S_prefix tokens into a cache.
    cache = init_cache(CFG, B, 32, dtype=jnp.float32)
    h_pre = h_full[:, :S_prefix]
    pos_pre = pos_full[:, :S_prefix]
    pre_lens = jnp.full((B,), S_prefix, jnp.int32)
    out_pre, cache = llama_forward(
        params, CFG, h_pre, pos_pre, pre_lens,
        q_offsets=jnp.zeros((B,), jnp.int32), cache=cache)

    np.testing.assert_allclose(np.asarray(out_pre),
                               np.asarray(out_full[:, :S_prefix]),
                               rtol=2e-5, atol=2e-5)

    # Decode the remaining tokens one at a time.
    outs = []
    for t in range(S_prefix, S_total):
        h_t = h_full[:, t:t + 1]
        pos_t = jnp.full((B, 1), t, jnp.int32)
        lens_t = jnp.full((B,), t + 1, jnp.int32)
        offs_t = jnp.full((B,), t, jnp.int32)
        out_t, cache = llama_forward(params, CFG, h_t, pos_t, lens_t,
                                     q_offsets=offs_t, cache=cache)
        outs.append(out_t)
    out_dec = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_dec),
                               np.asarray(out_full[:, S_prefix:]),
                               rtol=2e-5, atol=2e-5)


def test_chunked_prefill_with_ragged_offsets(params):
    """Option scoring: a chunk appended at different per-row offsets must
    match the row-wise full forward (vstar_bench_eval.py:127-161 semantics)."""
    B, S_max = 2, 24
    prefix_lens = np.array([6, 9])
    chunk_len = 4
    key = jax.random.PRNGKey(4)
    ids = jax.random.randint(key, (B, S_max), 0, CFG.vocab_size)

    # Full forwards, one row at a time at its own true length.
    full_rows = []
    for b in range(B):
        n = prefix_lens[b] + chunk_len
        h = embed_tokens(params, ids[b:b + 1, :n], jnp.float32)
        pos = jnp.arange(n)[None]
        out, _ = llama_forward(params, CFG, h, pos,
                               jnp.array([n], jnp.int32))
        full_rows.append(np.asarray(out[0, prefix_lens[b]:n]))

    # Cached path: prefill ragged prefixes, then append the chunk.
    cache = init_cache(CFG, B, S_max, dtype=jnp.float32)
    S_pad = int(prefix_lens.max())
    h_pre = embed_tokens(params, ids[:, :S_pad], jnp.float32)
    pos_pre = jnp.broadcast_to(jnp.arange(S_pad), (B, S_pad))
    lens = jnp.asarray(prefix_lens, jnp.int32)
    _, cache = llama_forward(params, CFG, h_pre, pos_pre, lens,
                             q_offsets=jnp.zeros((B,), jnp.int32),
                             cache=cache)

    chunk_ids = np.stack([np.asarray(ids[b, prefix_lens[b]:prefix_lens[b] + chunk_len])
                          for b in range(B)])
    h_chunk = embed_tokens(params, jnp.asarray(chunk_ids), jnp.float32)
    pos_chunk = lens[:, None] + jnp.arange(chunk_len)[None]
    out_chunk, cache = llama_forward(
        params, CFG, h_chunk, pos_chunk, lens + chunk_len,
        q_offsets=lens, cache=cache)

    for b in range(B):
        np.testing.assert_allclose(np.asarray(out_chunk[b]), full_rows[b],
                                   rtol=2e-5, atol=2e-5)


def test_hf_llama_parity():
    """Greedy logits must match HF transformers LlamaForCausalLM on the
    same (tiny, randomly initialized) weights."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        attn_implementation="eager", tie_word_embeddings=False,
        head_dim=CFG.head_dim)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    from vstar_tpu.core.hf_import import llama_params_from_torch
    params = llama_params_from_torch(
        {k: v for k, v in hf.state_dict().items()}, CFG)

    B, S = 2, 10
    ids_np = np.random.RandomState(0).randint(0, CFG.vocab_size, (B, S))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids_np)).logits.numpy()

    h = embed_tokens(params, jnp.asarray(ids_np), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    out, _ = llama_forward(params, CFG, h, pos, jnp.full((B,), S, jnp.int32))
    logits = np.asarray(lm_logits(params, out))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)
