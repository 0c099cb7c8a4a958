"""int4 fused-kernel decode/prefill vs the int8 serving default at 7B.

Measures (relay-aware: K reps chained in one jitted call, scalar fetch):
  * decode ms/token   int8 (XLA fused dequant) vs int4 (Pallas kernel)
  * prefill@384 ms    int8 vs int4 (the kernel re-reads weights per
                      row-block there; expected to lose — decode is the
                      target)
  * device parity     kernel output vs the XLA _deq4 expression on a
                      random block (max abs err; bf16-dot tolerance)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int4_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.nn.llama import (embed_tokens, init_cache, llama_forward,
                                lm_logits)

K = 8
S = 384

cfg = vsm_7b()


def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out))          # compile + sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / K * 1000
    print(f"{name:40s} {dt:8.2f} ms/iter (chain of {K})", flush=True)
    return dt


def chain(fn, x0):
    return jax.lax.fori_loop(0, K, lambda i, x: fn(x), x0)


def make_decode(params):
    # params enter as jit ARGS (closing over them bakes ~7 GB of
    # constants into the program — remote compile 413s; CLAUDE.md)
    @jax.jit
    def decode_t(params, seed):
        cache = init_cache(cfg.llama, 1, 512, jnp.bfloat16)
        cache = cache._replace(length=jnp.full((1,), S, jnp.int32))
        tok = jnp.full((1, 1), 17, jnp.int32)

        def one(i, carry):
            cache, x = carry
            h = embed_tokens(params["llama"], tok, jnp.bfloat16) + x * 1e-9
            pos = cache.length[:, None]
            hidden, cache = llama_forward(params["llama"], cfg.llama, h,
                                          pos, cache.length + 1,
                                          q_offsets=cache.length,
                                          cache=cache)
            return cache, lm_logits(params["llama"],
                                    hidden).mean().astype(x.dtype)

        return jax.lax.fori_loop(0, K, one, (cache, seed))[1]
    return lambda seed: decode_t(params, seed)


def make_prefill(params):
    @jax.jit
    def prefill_t(params, seed):
        ids = jnp.full((1, S), 17, jnp.int32)
        h = embed_tokens(params["llama"], ids, jnp.bfloat16) + seed * 1e-6
        pos = jnp.broadcast_to(jnp.arange(S), (1, S))
        lens = jnp.full((1,), S, jnp.int32)

        def one(x):
            hidden, _ = llama_forward(params["llama"], cfg.llama, x, pos,
                                      lens)
            return x + hidden.mean() * 1e-6

        return jnp.sum(chain(one, h)[0, 0, 0])
    return lambda seed: prefill_t(params, seed)


def parity_probe():
    """Kernel vs XLA _deq4 on one 7B-shaped matmul, on device."""
    from vstar_tpu.kernels.int4_matmul import int4_matmul
    from vstar_tpu.nn.quant import _deq4, quantize_weight_int4
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (4096, 4096), jnp.float32) * 0.02
    e = quantize_weight_int4(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4096),
                          jnp.bfloat16)

    @jax.jit
    def both(x, q4, s4):
        yk = int4_matmul(x, q4, s4)
        yx = (x @ _deq4({"q4": q4, "s4": s4}, jnp.bfloat16)
              ).astype(yk.dtype)
        return jnp.max(jnp.abs(yk - yx)), jnp.max(jnp.abs(yx))

    err, ref = both(x, e["q4"], e["s4"])
    print(f"kernel-vs-XLA max abs err {float(err):.4e} "
          f"(ref max {float(ref):.3f})", flush=True)


def parity_probe_w4a8():
    """W4A8 kernel vs exact integer reference on one 7B-shaped matmul."""
    from vstar_tpu.kernels.int4_matmul import int4_matmul_w4a8
    from vstar_tpu.nn.quant import quantize_weight_int4
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (4096, 4096), jnp.float32) * 0.02
    e = quantize_weight_int4(w)
    xq = jax.random.randint(jax.random.PRNGKey(1), (1, 4096), -127, 128,
                            jnp.int8)

    @jax.jit
    def run(xq, q4, s4):
        return int4_matmul_w4a8(xq, q4, s4)

    y = np.asarray(run(xq, e["q4"], e["s4"].astype(jnp.float32)),
                   np.float64)
    qp = np.asarray(e["q4"])
    lo = ((qp & 0xF) ^ 8).astype(np.int64) - 8
    hi = (((qp >> 4) & 0xF) ^ 8).astype(np.int64) - 8
    sv = np.zeros((4096, 4096), np.int64)
    sv[0::2], sv[1::2] = lo, hi
    sf = np.repeat(np.asarray(e["s4"], np.float64), 128, axis=0)
    ref = np.asarray(xq, np.int64) @ (sv * sf)
    rel = np.max(np.abs(y - ref)) / max(np.max(np.abs(ref)), 1e-9)
    print(f"w4a8 kernel-vs-int-ref rel err {rel:.4e}", flush=True)


def main():
    from vstar_tpu.nn.quant import set_act_int8
    print("devices:", jax.devices(), flush=True)
    parity_probe()
    parity_probe_w4a8()
    p8 = init_vsm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                         quantize_llm=True)
    d8 = timed("llama decode 1 tok (int8, XLA)", make_decode(p8),
               jnp.float32(1.0))
    f8 = timed("llama prefill 384  (int8, XLA)", make_prefill(p8),
               jnp.float32(1.0))
    del p8
    p4 = init_vsm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                         quantize_llm="int4")
    d4 = timed("llama decode 1 tok (int4, Pallas)", make_decode(p4),
               jnp.float32(1.0))
    f4 = timed("llama prefill 384  (int4, Pallas)", make_prefill(p4),
               jnp.float32(1.0))
    set_act_int8(True)
    try:
        d48 = timed("llama decode 1 tok (int4 W4A8)", make_decode(p4),
                    jnp.float32(1.0))
    finally:
        set_act_int8(False)
    del p4
    # int4mix: per-matrix int4/int8 from the measured truth table
    # (nn/quant.INT4MIX_INT4_KEYS) — the residency/speed middle point
    pm = init_vsm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                         quantize_llm="int4mix")
    dm = timed("llama decode 1 tok (int4mix)", make_decode(pm),
               jnp.float32(1.0))
    fm = timed("llama prefill 384  (int4mix)", make_prefill(pm),
               jnp.float32(1.0))
    print(f"decode speedup int4/int8: {d8 / d4:.2f}x; "
          f"W4A8/int8: {d8 / d48:.2f}x; int4mix/int8: {d8 / dm:.2f}x; "
          f"int4mix/int4: {d4 / dm:.2f}x; "
          f"prefill ratios int4 {f8 / f4:.2f}x, int4mix {f8 / fm:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
