"""Measure the experimental W8A8 (int8 weights x per-token int8
activations, int32 MXU accumulation) LLaMA matmul path against the
default weight-only-int8 path on the real chip.

Decision inputs: prefill@384 latency (the dominant cost of a VSM search
step) and decode latency, plus greedy-parity + logit drift on a tiny
model. Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/w8a8_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import vsm_7b, vsm_tiny
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.nn.llama import embed_tokens, init_cache, llama_forward, \
    lm_logits
from vstar_tpu.nn.quant import set_act_int8

K = 8
S = 384


def build_prefill(params, cfg):
    @jax.jit
    def prefill_t(params, seed):
        ids = jnp.full((1, S), 17, jnp.int32)
        h = embed_tokens(params["llama"], ids, jnp.bfloat16) + seed * 1e-6
        pos = jnp.broadcast_to(jnp.arange(S), (1, S))
        lens = jnp.full((1,), S, jnp.int32)

        def body(i, x):
            hidden, _ = llama_forward(params["llama"], cfg.llama, x, pos,
                                      lens)
            return x + hidden.mean() * 1e-6

        return jnp.sum(jax.lax.fori_loop(0, K, body, h)[0, 0, 0])
    return prefill_t


def build_decode(params, cfg):
    @jax.jit
    def decode_t(params, seed):
        cache = init_cache(cfg.llama, 1, 512, jnp.bfloat16)
        cache = cache._replace(length=jnp.full((1,), S, jnp.int32))
        tok = jnp.full((1, 1), 17, jnp.int32)

        def body(i, carry):
            cache, x = carry
            h = embed_tokens(params["llama"], tok, jnp.bfloat16) + x * 1e-9
            pos = cache.length[:, None]
            hidden, cache = llama_forward(params["llama"], cfg.llama, h,
                                          pos, cache.length + 1,
                                          q_offsets=cache.length,
                                          cache=cache)
            return cache, lm_logits(params["llama"],
                                    hidden).mean().astype(x.dtype)

        _, x = jax.lax.fori_loop(0, K, body, (cache, seed))
        return x
    return decode_t


def timed(name, fn, params):
    v = float(np.asarray(fn(params, jnp.float32(1.0))))  # compile
    t0 = time.perf_counter()
    v = float(np.asarray(fn(params, jnp.float32(1.0))))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f"{name:40s} {dt:8.2f} ms/iter")
    return dt


def tiny_parity():
    cfg = vsm_tiny()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             quantize_llm=True)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(1, 16, cfg.llama.hidden_size), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(16), (1, 16))
    lens = jnp.full((1,), 16, jnp.int32)

    def fwd(p):
        hidden, _ = llama_forward(p["llama"], cfg.llama, h, pos, lens)
        return lm_logits(p["llama"], hidden)

    set_act_int8(False)
    base = np.asarray(jax.jit(fwd)(params), np.float32)
    set_act_int8(True)
    w8a8 = np.asarray(jax.jit(fwd)(params), np.float32)
    set_act_int8(False)
    drift = np.abs(base - w8a8).max()
    agree = float((base.argmax(-1) == w8a8.argmax(-1)).mean())
    print(f"tiny logits: max|drift|={drift:.4f} argmax agree={agree:.3f}")


def main():
    print("devices:", jax.devices())
    cfg = vsm_7b()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.bfloat16, quantize_llm=True)

    set_act_int8(False)
    t_pref = timed("prefill 384 weight-only int8 (bf16 MXU)",
                   build_prefill(params, cfg), params)
    t_dec = timed("decode 1 tok weight-only int8", build_decode(params, cfg),
                  params)

    set_act_int8(True)
    t_pref8 = timed("prefill 384 W8A8 (int8 MXU)",
                    build_prefill(params, cfg), params)
    t_dec8 = timed("decode 1 tok W8A8", build_decode(params, cfg), params)
    set_act_int8(False)

    print(f"prefill speedup: {t_pref / t_pref8:.2f}x; "
          f"decode speedup: {t_dec / t_dec8:.2f}x")
    tiny_parity()


if __name__ == "__main__":
    main()
