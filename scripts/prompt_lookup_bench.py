"""Prompt-lookup speculative decoding at 7B: the measured envelope.

Acceptance is content-dependent and real checkpoints are gated, so this
measures the two ends the real number must land between, at the decode
level (a 576-token prefilled cache, 64 new tokens):

  * greedy           — the baseline ms/token
  * all-reject       — TRUE worst case: a static draft of -1s, so every
                       chunk emits exactly one token (pure verify
                       overhead; speculative_decode with an impossible
                       draft)
  * lookup, random   — random context. NOT zero-acceptance: the lookup
                       buffer includes the model's own generated tail,
                       so any self-repetition (which random weights
                       produce in loops, and real answers produce too)
                       gets drafted and accepted
  * lookup, oracle   — best case: the model's own greedy output placed
                       in the context, so the bigram retrieval drafts
                       the true continuation (acceptance ~1)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prompt_lookup_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import vqa_llm_7b
from vstar_tpu.decode.sampler import greedy_decode
from vstar_tpu.decode.speculative import lookup_decode
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.nn.llama import (embed_tokens, init_cache, llama_forward,
                                lm_logits)

PROMPT = 576
MAX_NEW = 64
CACHE = 768
EOS = 2


def main():
    print("devices:", jax.devices())
    cfg = vqa_llm_7b().llama
    params = init_vqa_llm_params(jax.random.PRNGKey(0), vqa_llm_7b(),
                                 dtype=jnp.bfloat16,
                                 quantize_llm=True)["llama"]
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(10, 31000, (1, PROMPT)))

    @jax.jit
    def prefill(params, ids):
        B, S = ids.shape
        cache = init_cache(cfg, B, CACHE, jnp.bfloat16)
        h = embed_tokens(params, ids, jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(S), (B, S))
        lens = jnp.full((B,), S, jnp.int32)
        hidden, cache = llama_forward(params, cfg, h, pos, lens,
                                      q_offsets=jnp.zeros((B,), jnp.int32),
                                      cache=cache)
        return lm_logits(params, hidden)[:, -1], hidden[:, -1], cache

    from functools import partial
    jit_greedy = jax.jit(partial(
        greedy_decode, cfg=cfg, max_new_tokens=MAX_NEW, stop_ids=[EOS],
        compute_dtype=jnp.bfloat16))
    jit_lookup = jax.jit(partial(
        lookup_decode, cfg=cfg, max_new_tokens=MAX_NEW, stop_ids=[EOS],
        chunk=8, compute_dtype=jnp.bfloat16))

    def run(fn, *a, **kw):
        ts = []
        for _ in range(4):
            logits, hidden, cache = prefill(params, ids)
            int(cache.length[0])        # sync (relay-safe scalar fetch)
            t0 = time.perf_counter()
            res = fn(params, cache=cache, first_logits=logits,
                     first_hidden=hidden, *a, **kw)
            n = int(res.num_generated[0])   # sync
            ts.append((time.perf_counter() - t0) / max(n, 1))
        fwd = int(res.n_forwards)
        tpf = (n - 1) / max(fwd, 1)         # tokens per decoder forward
        return min(ts) * 1e3, res, tpf

    ms, ref, tpf = run(jit_greedy)
    print(f"greedy          : {ms:6.2f} ms/token ({tpf:.2f} tok/forward)")

    from vstar_tpu.decode.speculative import speculative_decode
    jit_reject = jax.jit(partial(
        speculative_decode, cfg=cfg, max_new_tokens=MAX_NEW,
        stop_ids=[EOS], chunk=8, compute_dtype=jnp.bfloat16))
    never = jnp.full((1, MAX_NEW + 8), -1, jnp.int32)
    ms_n, rej, tpf = run(jit_reject, draft=never)
    print(f"all-reject      : {ms_n:6.2f} ms/token  "
          f"(true worst-case overhead {ms_n / ms:.2f}x, "
          f"{tpf:.2f} tok/forward)")

    ctx_rand = jnp.asarray(rng.randint(10, 31000,
                                       (1, PROMPT)), jnp.int32)
    clen = jnp.asarray([PROMPT], jnp.int32)
    ms_r, worst, tpf = run(jit_lookup, ctx_ids=ctx_rand, ctx_len=clen)
    print(f"lookup (random) : {ms_r:6.2f} ms/token  "
          f"({ms / ms_r:.2f}x, {tpf:.2f} tok/forward — self-repetition "
          f"acceptance, see docstring)")

    n = int(ref.num_generated[0])
    oracle = np.full((1, PROMPT), -1, np.int32)
    body = [int(ids[0, -1])] + [int(t) for t in
                                np.asarray(ref.tokens[0, :n])]
    oracle[0, :len(body)] = body
    ms_o, best, tpf = run(jit_lookup, ctx_ids=jnp.asarray(oracle),
                          ctx_len=jnp.asarray([len(body)], jnp.int32))
    print(f"lookup (oracle) : {ms_o:6.2f} ms/token  "
          f"(best-case speedup {ms / ms_o:.2f}x, {tpf:.2f} tok/forward)")
    for r in (best, worst, rej):
        np.testing.assert_array_equal(np.asarray(r.tokens),
                                      np.asarray(ref.tokens))
    print("bit-equality vs greedy: OK (all variants)")


if __name__ == "__main__":
    main()
