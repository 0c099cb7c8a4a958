"""Does int8 weight STORAGE ORIENTATION move the XLA matvec off 465 GB/s?

The r5 truth table (scripts/int4_profile.py --matmul, valid scan-over-
distinct-weights benches) showed a 1.7x orientation asymmetry in the
int8 XLA matvec at R=1:

    4096 x 11008 (gate/up, big OUT)  0.097 ms  ->  465 GB/s
    11008 x 4096 (down,   big IN )   0.056 ms  ->  805 GB/s
    4096 x 32000 (lm_head, big OUT)  0.283 ms  ->  463 GB/s

Both read the same bytes; only which side is the contraction differs.
Hypothesis: storing the big-OUT weights TRANSPOSED as [OUT, IN] and
contracting the last axis of both operands (einsum 'ri,oi->ro') gives
XLA the fast access pattern for those matrices too. If true at R=1
without regressing prefill-shaped rows, the int8 decode path gets
gate/up + lm_head at ~800 GB/s for free (no kernel, pure layout):
~2.6 ms/tok off the 16.1 ms int8 decode.

Variants per shape (all weight-only int8, dequant fused into the dot):
    io      x[R,IN] @ (q[IN,OUT] * s[1,OUT])          -- shipping qdot
    oi      einsum('ri,oi->ro', x, q[OUT,IN]*s[OUT,1]) -- transposed store
    oi_dg   same but dot_general((1,),(1,)) directly (no einsum layer)

Bench validity: scan over L DISTINCT stacked weights with a
carry-coupled activation (un-hoistable), K_CHAIN outer fori — the
kernels/int4_matmul.py truth-table rule.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_layout_probe.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

K_CHAIN = 64

# (IN, OUT, L): the 7B decode shapes where int8-XLA sits BELOW roofline
SHAPES = ((4096, 11008, 12), (4096, 32000, 8), (4096, 4096, 16),
          (11008, 4096, 12))


def timed_ms(fn, *args, reps: int = 3) -> float:
    float(np.asarray(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def apply(mode, x, e):
    if mode == "io":
        w = e["q"].astype(x.dtype) * e["s"].astype(x.dtype)
        return x @ w
    wt = e["qT"].astype(x.dtype) * e["sT"].astype(x.dtype)
    if mode == "oi":
        return jnp.einsum("ri,oi->ro", x, wt)
    # oi_dg: contraction ((1,),(1,)) with explicit dot_general
    return jax.lax.dot_general(x, wt, (((1,), (1,)), ((), ())))


def stacked(mode, IN, OUT, L, key):
    if mode == "io":
        return {"q": jax.random.randint(key, (L, IN, OUT), -127, 128,
                                        dtype=jnp.int8),
                "s": jnp.full((L, 1, OUT), 1e-2, jnp.float32)}
    return {"qT": jax.random.randint(key, (L, OUT, IN), -127, 128,
                                     dtype=jnp.int8),
            "sT": jnp.full((L, OUT, 1), 1e-2, jnp.float32)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="*", default=[1, 256])
    ap.add_argument("--modes", nargs="*", default=["io", "oi", "oi_dg"])
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    # numerical sanity: oi == io bit-for-intent (same dequant math)
    q = jax.random.randint(jax.random.PRNGKey(0), (256, 512), -127, 128,
                           dtype=jnp.int8)
    s = jax.random.uniform(jax.random.PRNGKey(1), (1, 512), jnp.float32,
                           0.001, 0.01)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 256), jnp.bfloat16)
    a = np.asarray(jax.jit(lambda: apply("io", x, {"q": q, "s": s}))())
    b = np.asarray(jax.jit(lambda: apply(
        "oi", x, {"qT": q.T, "sT": s.T}))())
    assert np.allclose(a, b, rtol=5e-2, atol=5e-2), np.abs(a - b).max()

    for R in args.rows:
        kc = K_CHAIN if R == 1 else max(4, K_CHAIN // 16)
        print(f"\n== rows R={R} (chain {kc}) ==", flush=True)
        for IN, OUT, L in SHAPES:
            mb = (IN * OUT + 4 * OUT) / 1e6  # int8 bytes + f32 scales
            line = [f"{IN}x{OUT:6d}"]
            for mode in args.modes:
                e = stacked(mode, IN, OUT, L,
                            jax.random.PRNGKey(IN + OUT))

                @jax.jit
                def run(e, x0, mode=mode):
                    def body(x, ei):
                        y = apply(mode, x, ei)
                        return (x + y[..., :1].astype(x.dtype) * 1e-24,
                                None)

                    def outer(i, x):
                        x, _ = jax.lax.scan(body, x, e)
                        return x

                    x = jax.lax.fori_loop(0, kc, outer, x0)
                    return jnp.sum(x.astype(jnp.float32))

                x0 = jax.random.normal(jax.random.PRNGKey(1), (R, IN),
                                       jnp.bfloat16)
                total = timed_ms(run, e, x0)
                per = total / (kc * L)
                gbs = mb / per
                line.append(f"{mode}: {per:7.3f} ms {gbs:6.0f} GB/s")
            print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
