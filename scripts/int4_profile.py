"""Where does the int4 7B decode's time actually go? (VERDICT r4 #1)

Decode-level r4 facts (trusted: carry-chained K-token loops):
  int8 16.1 ms/tok vs W4A16 31.5 / W4A8 29.6 — int4 at ~0.52x of int8
  despite HALF the weight bytes. The kernel's old 0.111 ms/matmul
  microbench was CHAINED SAME-OPERAND (invalid per the repo's
  bench-validity rule: XLA hoists loop-invariant pallas_calls); this
  script replaces it with valid measurements and decomposes the decode.

Stages (flags; each bounded so relay init costs stay visible):
  --probe     Mosaic op probes: is `int8 * 16` a legal+correct lo-nibble
              unpack (1 VPU op vs the current widen+shift+mask+narrow 4)?
  --matmul    per-matmul scan benches over L DISTINCT stacked weights
              with a carry-dependent activation (un-hoistable): int8-XLA
              vs W4A16 vs W4A8 vs candidate kernel variants, every 7B
              decode shape; reports ms + effective GB/s on packed bytes.
  --xla-int4  does THIS jax/XLA lower jnp.int4 storage + fused dequant
              dots well enough to beat the Pallas kernels?
  --decode    decode-level ablations at full 7B: int8 / W4A16 / W4A8 /
              int4-layers+int8-lm_head / int8-layers+int4-lm_head /
              headless (no lm_head) — attributes the 29.6 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int4_profile.py --probe --matmul
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

K_CHAIN = 64      # outer fori chains (per-matmul stages; large so the
                  # relay dispatch overhead — measured 32 ms in a busy
                  # session — is negligible per matmul)
K_DECODE = 8      # decode tokens per dispatch (matches int4_bench)


def overhead_ms(reps: int = 5) -> float:
    f = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    d = jnp.ones((2304,), jnp.float32)
    float(np.asarray(f(d)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(d)))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def timed_ms(fn, *args, reps: int = 3) -> float:
    float(np.asarray(fn(*args)))          # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


# ---------------------------------------------------------------------------
# --probe: Mosaic lo-nibble unpack candidates
# ---------------------------------------------------------------------------

def probe_mosaic():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = jax.random.randint(jax.random.PRNGKey(0), (256, 256), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    want_lo = np.asarray(
        ((np.asarray(q).astype(np.int32) << 4) & 0xF0)).astype(np.int8)

    def k_mul(q_ref, o_ref):
        # lo<<4 as ONE int8 multiply: bitcast(q,i8)*16 wraps mod 256 ==
        # (q&0xF)<<4 two's-complement — replaces widen+shift+mask+narrow
        o_ref[...] = pltpu.bitcast(q_ref[...], jnp.int8) * jnp.int8(16)

    def k_add(q_ref, o_ref):
        # same trick without mul: x+x four times (if i8 mul is illegal)
        x = pltpu.bitcast(q_ref[...], jnp.int8)
        x = x + x
        x = x + x
        x = x + x
        x = x + x
        o_ref[...] = x

    for name, kern in (("i8 mul by 16", k_mul), ("i8 add x4", k_add)):
        try:
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(q.shape, jnp.int8),
            )(q)
            ok = np.array_equal(np.asarray(out), want_lo)
            print(f"probe {name:16s}: compiles, correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe any Mosaic failure
            print(f"probe {name:16s}: FAILS ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)


# ---------------------------------------------------------------------------
# candidate W4A8 kernel variants (timed in --matmul; promoted to
# kernels/int4_matmul.py only if they WIN at decode level)
# ---------------------------------------------------------------------------

def _w4a8_kernel_mul(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ng, gh):
    """Current W4A8 kernel with the lo unpack as ONE i8 multiply.

    MEASURED DEAD (r5, this script --probe): Mosaic fails to legalize
    vector arith.muli on i8 (and repeated i8 addi likewise), so the
    1-op lo unpack is unreachable — the shipping widen+shift+mask+narrow
    (4 ops/packed byte) stands. Kept as the experiment record."""
    from jax.experimental.pallas import tpu as pltpu
    qp = q4_ref[...]
    lo16 = pltpu.bitcast(qp, jnp.int8) * jnp.int8(16)
    hi16 = pltpu.bitcast(qp & jnp.uint8(0xF0), jnp.int8)
    xe = xe_ref[...]
    xo = xo_ref[...]
    s = s4_ref[...] * (1.0 / 16.0)
    dims = (((1,), (0,)), ((), ()))
    acc = None
    for g in range(ng):
        a, b = g * gh, (g + 1) * gh
        d = (jax.lax.dot_general(xe[:, a:b], lo16[a:b], dims,
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(xo[:, a:b], hi16[a:b], dims,
                                   preferred_element_type=jnp.int32))
        term = d.astype(jnp.float32) * s[g:g + 1]
        acc = term if acc is None else acc + term
    o_ref[...] = acc.astype(o_ref.dtype)


def _w4a8_kernel_2and(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ng, gh):
    """lo unpack as TWO u8 ANDs + an extra int8 dot (no i32 widening):
    two's-complement lo = (q & 0x07) - (q & 0x08 as value 8*b3), so
    dot(xe, lo) = dot(xe, l7) - dot(xe, m8). VPU cost 2 u8 ops/byte vs
    the shipping kernel's 4 i32-lane ops; MXU streams 3 blocks vs 2
    (MXU is not the bottleneck at R=1)."""
    from jax.experimental.pallas import tpu as pltpu
    qp = q4_ref[...]
    l7 = pltpu.bitcast(qp & jnp.uint8(0x07), jnp.int8)
    m8 = pltpu.bitcast(qp & jnp.uint8(0x08), jnp.int8)
    hi16 = pltpu.bitcast(qp & jnp.uint8(0xF0), jnp.int8)
    xe = xe_ref[...]
    xo = xo_ref[...]
    s = s4_ref[...] * (1.0 / 16.0)
    dims = (((1,), (0,)), ((), ()))
    acc = None
    for g in range(ng):
        a, b = g * gh, (g + 1) * gh
        d_lo = (jax.lax.dot_general(xe[:, a:b], l7[a:b], dims,
                                    preferred_element_type=jnp.int32)
                - jax.lax.dot_general(xe[:, a:b], m8[a:b], dims,
                                      preferred_element_type=jnp.int32))
        d_hi = jax.lax.dot_general(xo[:, a:b], hi16[a:b], dims,
                                   preferred_element_type=jnp.int32)
        term = (16 * d_lo + d_hi).astype(jnp.float32) * s[g:g + 1]
        acc = term if acc is None else acc + term
    o_ref[...] = acc.astype(o_ref.dtype)


def _w4a8_kernel_off(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ng, gh):
    """lo unpack as offset-binary (q ^ 8) & 0x0F = lo + 8, corrected by
    8 * rowsum(xe) per group: 3 u8 ops/byte total, 2 MXU streams + a
    tiny [R, gh] reduce per group."""
    from jax.experimental.pallas import tpu as pltpu
    qp = q4_ref[...]
    lo_off = pltpu.bitcast((qp ^ jnp.uint8(0x08)) & jnp.uint8(0x0F),
                           jnp.int8)
    hi16 = pltpu.bitcast(qp & jnp.uint8(0xF0), jnp.int8)
    xe = xe_ref[...]
    xo = xo_ref[...]
    s = s4_ref[...] * (1.0 / 16.0)
    dims = (((1,), (0,)), ((), ()))
    acc = None
    for g in range(ng):
        a, b = g * gh, (g + 1) * gh
        d_lo = jax.lax.dot_general(xe[:, a:b], lo_off[a:b], dims,
                                   preferred_element_type=jnp.int32)
        corr = jnp.sum(xe[:, a:b].astype(jnp.int32), axis=1,
                       keepdims=True)                      # [R, 1]
        d_hi = jax.lax.dot_general(xo[:, a:b], hi16[a:b], dims,
                                   preferred_element_type=jnp.int32)
        term = (16 * (d_lo - 8 * corr) + d_hi
                ).astype(jnp.float32) * s[g:g + 1]
        acc = term if acc is None else acc + term
    o_ref[...] = acc.astype(o_ref.dtype)


def _w4a8_kernel_rows(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ngb, gh):
    """Row-blocked variant: grid over IN2 with FULL-OUT weight blocks, so
    every DMA reads fully contiguous rows of the [IN2, OUT] packed array
    (the shipping kernel's [IN2, 256] column blocks read 256-byte strided
    chunks — the contiguity hypothesis for the ~130-250 GB/s ceiling).
    Output accumulates across grid steps.

    DEAD (r5): the per-step scale block (ngb, OUT) violates the Pallas
    TPU rule that the second-to-last block dim divide 8 (ngb=2 for the
    11008-IN shapes), and no ngb satisfies it for NG=86. The transposed
    variant (_w4a8_kernel_t) tests the same DMA-contiguity hypothesis
    without the constraint — use that."""
    from jax.experimental import pallas as pl
    qp = q4_ref[...]
    lo16 = ((qp.astype(jnp.int32) << 4) & 0xF0).astype(jnp.int8)
    from jax.experimental.pallas import tpu as pltpu
    hi16 = pltpu.bitcast(qp & jnp.uint8(0xF0), jnp.int8)
    xe = xe_ref[...]
    xo = xo_ref[...]
    s = s4_ref[...] * (1.0 / 16.0)
    dims = (((1,), (0,)), ((), ()))
    acc = None
    for g in range(ngb):
        a, b = g * gh, (g + 1) * gh
        d = (jax.lax.dot_general(xe[:, a:b], lo16[a:b], dims,
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(xo[:, a:b], hi16[a:b], dims,
                                   preferred_element_type=jnp.int32))
        term = d.astype(jnp.float32) * s[g:g + 1]
        acc = term if acc is None else acc + term

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = acc.astype(o_ref.dtype)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        o_ref[...] += acc.astype(o_ref.dtype)


def _w4a8_kernel_t(xe_ref, xo_ref, q4t_ref, s4t_ref, o_ref, *, ng, gh):
    """Transposed-storage variant: q4t [OUT, IN2] packed, so each
    [block_o, IN2] weight block is FULLY CONTIGUOUS in HBM (the shipping
    [IN2, block_o] blocks of an OUT-minor array read 256-byte strided
    chunks). Output written [OUT, R]; scales [OUT, NG]."""
    from jax.experimental.pallas import tpu as pltpu
    qp = q4t_ref[...]                                 # [BO, IN2] u8
    lo16 = ((qp.astype(jnp.int32) << 4) & 0xF0).astype(jnp.int8)
    hi16 = pltpu.bitcast(qp & jnp.uint8(0xF0), jnp.int8)
    xe = xe_ref[...]                                  # [IN2, R] int8
    xo = xo_ref[...]                                  # (pre-transposed:
    # Mosaic only lowers int32-accum dots in the standard (1,)x(0,)
    # orientation — contracting dim1 against dim1 raised
    # NotImplementedError for preferred_element_type=int32)
    s = s4t_ref[...] * (1.0 / 16.0)                   # [BO, NG] f32
    dims = (((1,), (0,)), ((), ()))
    acc = None
    for g in range(ng):
        a, b = g * gh, (g + 1) * gh
        d = (jax.lax.dot_general(lo16[:, a:b], xe[a:b], dims,
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(hi16[:, a:b], xo[a:b], dims,
                                   preferred_element_type=jnp.int32))
        term = d.astype(jnp.float32) * s[:, g:g + 1]  # [BO, R]
        acc = term if acc is None else acc + term
    o_ref[...] = acc.astype(o_ref.dtype)


def _w4a8_call_t(xq, q4t, s4t, block_o=256):
    from jax.experimental import pallas as pl
    R, IN = xq.shape
    OUT, IN2 = q4t.shape
    NG = s4t.shape[1]
    gh = IN2 // NG
    xe = xq[:, 0::2].T                                # [IN2, R]
    xo = xq[:, 1::2].T
    y = pl.pallas_call(
        functools.partial(_w4a8_kernel_t, ng=NG, gh=gh),
        grid=(OUT // block_o,),
        in_specs=[
            pl.BlockSpec((IN2, R), lambda j: (0, 0)),
            pl.BlockSpec((IN2, R), lambda j: (0, 0)),
            pl.BlockSpec((block_o, IN2), lambda j: (j, 0)),
            pl.BlockSpec((block_o, NG), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_o, R), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((OUT, R), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * OUT,
            bytes_accessed=IN2 * OUT + 4 * NG * OUT + R * (IN + 4 * OUT),
            transcendentals=0),
    )(xe, xo, q4t, s4t)
    return y.T


def _w4a8_call_rows(xq, q4, s4, block_i=None):
    from jax.experimental import pallas as pl
    R, IN = xq.shape
    IN2, OUT = q4.shape
    NG = s4.shape[0]
    gh = IN2 // NG
    if block_i is None:
        # most steps with blocks >= ~512 KB: multiples of gh dividing IN2
        cands = [m * gh for m in range(1, NG + 1)
                 if NG % m == 0 and (m * gh) * OUT >= 4 * 128 * 1024]
        block_i = cands[0] if cands else IN2
    ngb = block_i // gh
    xe = xq[:, 0::2]
    xo = xq[:, 1::2]
    return pl.pallas_call(
        functools.partial(_w4a8_kernel_rows, ngb=ngb, gh=gh),
        grid=(IN2 // block_i,),
        in_specs=[
            pl.BlockSpec((R, block_i), lambda i: (0, i)),
            pl.BlockSpec((R, block_i), lambda i: (0, i)),
            pl.BlockSpec((block_i, OUT), lambda i: (i, 0)),
            pl.BlockSpec((ngb, OUT), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((R, OUT), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, OUT), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * OUT,
            bytes_accessed=IN2 * OUT + 4 * NG * OUT + R * (IN + 4 * OUT),
            transcendentals=0),
    )(xe, xo, q4, s4)


def _w4a8_call(kernel, xq, q4, s4, block_o=256):
    from jax.experimental import pallas as pl
    R, IN = xq.shape
    IN2, OUT = q4.shape
    NG = s4.shape[0]
    gh = IN2 // NG
    xe = xq[:, 0::2]
    xo = xq[:, 1::2]
    return pl.pallas_call(
        functools.partial(kernel, ng=NG, gh=gh),
        grid=(1, OUT // block_o),
        in_specs=[
            pl.BlockSpec((R, IN2), lambda i, j: (i, 0)),
            pl.BlockSpec((R, IN2), lambda i, j: (i, 0)),
            pl.BlockSpec((IN2, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((NG, block_o), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((R, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((R, OUT), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * IN * OUT,
            bytes_accessed=IN2 * OUT + 4 * NG * OUT + R * (IN + 4 * OUT),
            transcendentals=0),
    )(xe, xo, q4, s4)


# ---------------------------------------------------------------------------
# --matmul: scan over L DISTINCT stacked weights, carry-dependent input
# ---------------------------------------------------------------------------

SHAPES = ((4096, 4096, 16), (4096, 11008, 12), (11008, 4096, 12),
          (4096, 32000, 8))


def _stacked(mode, IN, OUT, L, key):
    if mode == "int8":
        return {"q": jax.random.randint(key, (L, IN, OUT), -127, 128,
                                        dtype=jnp.int8),
                "s": jnp.full((L, 1, OUT), 1e-2, jnp.float32)}
    ng = 1 if mode.endswith("pc") else IN // 128
    if mode.startswith("w4a8_t"):
        return {"q4t": jax.random.randint(key, (L, OUT, IN // 2), 0, 256,
                                          jnp.int32).astype(jnp.uint8),
                "s4t": jnp.full((L, OUT, ng), 1e-2, jnp.float32)}
    return {"q4": jax.random.randint(key, (L, IN // 2, OUT), 0, 256,
                                     jnp.int32).astype(jnp.uint8),
            "s4": jnp.full((L, ng, OUT), 1e-2, jnp.float32)}


def bench_matmuls(modes):
    from vstar_tpu.kernels.int4_matmul import int4_matmul, int4_matmul_w4a8
    from vstar_tpu.nn.quant import qdot, set_act_int8

    ovh = overhead_ms()
    print(f"dispatch overhead {ovh:.2f} ms", flush=True)

    from vstar_tpu.kernels.int4_matmul import _w4a8_kernel as _ship_kernel

    def apply(mode, x, e):
        if mode == "int8":
            return qdot(x, e)
        if mode == "w4a16":
            return int4_matmul(x, e["q4"], e["s4"])
        # int8 activations, quant outside the timed weight read is decode
        # reality (qdot4_w4a8 does it per call; keep it IN the loop)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        if mode == "w4a8_mul":           # dead: Mosaic i8 muli illegal
            y = _w4a8_call(_w4a8_kernel_mul, xq, e["q4"], e["s4"])
        elif mode == "w4a8_bo512":       # shipping kernel, bigger blocks
            y = _w4a8_call(_ship_kernel, xq, e["q4"], e["s4"],
                           block_o=512)
        elif mode == "w4a8_2and":
            y = _w4a8_call(_w4a8_kernel_2and, xq, e["q4"], e["s4"])
        elif mode == "w4a8_2and_bo512":
            y = _w4a8_call(_w4a8_kernel_2and, xq, e["q4"], e["s4"],
                           block_o=512)
        elif mode == "w4a8_off":
            y = _w4a8_call(_w4a8_kernel_off, xq, e["q4"], e["s4"])
        elif mode == "w4a8_off_bo512":
            y = _w4a8_call(_w4a8_kernel_off, xq, e["q4"], e["s4"],
                           block_o=512)
        elif mode == "w4a8_rows":
            y = _w4a8_call_rows(xq, e["q4"], e["s4"])
        elif mode.startswith("w4a8_t"):
            bo = 512 if mode.endswith("512") else 256
            y = _w4a8_call_t(xq, e["q4t"], e["s4t"], block_o=bo)
        else:                      # w4a8 / w4a8_pc (shipping kernel)
            y = int4_matmul_w4a8(xq, e["q4"], e["s4"])
        return (y * sx).astype(x.dtype)

    set_act_int8(False)
    results = {}
    for IN, OUT, L in SHAPES:
        for mode in modes:
            if mode.endswith("bo512") and OUT % 512:
                continue
            e = _stacked(mode, IN, OUT, L, jax.random.PRNGKey(IN + OUT))

            @jax.jit
            def run(e, x0, mode=mode):
                def body(x, ei):
                    y = apply(mode, x, ei)
                    # carry coupling: next input depends on this output
                    # (value-symbolic -> the scan body cannot be hoisted)
                    return x + y[..., :1].astype(x.dtype) * 1e-24, None

                def outer(i, x):
                    x, _ = jax.lax.scan(body, x, e)
                    return x

                x = jax.lax.fori_loop(0, K_CHAIN, outer, x0)
                return jnp.sum(x.astype(jnp.float32))

            x0 = jax.random.normal(jax.random.PRNGKey(1), (1, IN),
                                   jnp.bfloat16)
            try:
                if mode.startswith(("w4a8_2and", "w4a8_off",
                                    "w4a8_rows", "w4a8_t")):
                    # candidates must be BIT-EQUAL to the shipping kernel
                    # (identical int32 accumulation, same f32 scaling)
                    e1 = jax.tree_util.tree_map(lambda a: a[0], e)
                    xq = jax.random.randint(jax.random.PRNGKey(2),
                                            (1, IN), -127, 128, jnp.int8)
                    if mode.startswith("w4a8_t"):
                        # t-mode entries store transposed tensors; verify
                        # against the shipping kernel on the UNtransposed
                        # view of the same weights
                        e1 = {"q4": jnp.swapaxes(e["q4t"][0], 0, 1),
                              "s4": jnp.swapaxes(e["s4t"][0], 0, 1)}
                        bo = 512 if mode.endswith("512") else 256

                        def once(xq, q, s, bo=bo):
                            return _w4a8_call_t(xq, jnp.swapaxes(q, 0, 1),
                                                jnp.swapaxes(s, 0, 1), bo)
                    elif "rows" in mode:
                        def once(xq, q, s):
                            return _w4a8_call_rows(xq, q, s)
                    else:
                        kern = (_w4a8_kernel_2and if "2and" in mode
                                else _w4a8_kernel_off)
                        bo = 512 if mode.endswith("bo512") else 256

                        def once(xq, q, s, kern=kern, bo=bo):
                            return _w4a8_call(kern, xq, q, s, bo)
                    got = np.asarray(jax.jit(once)(xq, e1["q4"],
                                                   e1["s4"]))
                    want = np.asarray(jax.jit(int4_matmul_w4a8)(
                        xq, e1["q4"], e1["s4"]))
                    assert np.array_equal(got, want), \
                        f"{mode} mismatch: {np.abs(got - want).max()}"
                total = timed_ms(run, e, x0)
            except Exception as err:  # noqa: BLE001 — Mosaic probes crash
                print(f"[{IN:5d}x{OUT:5d}] {mode:14s} FAILS "
                      f"({type(err).__name__})", flush=True)
                del e
                continue
            per = (total - ovh) / (K_CHAIN * L)
            bytes_w = (IN * OUT if mode == "int8" else IN * OUT // 2)
            gbs = bytes_w / (per * 1e-3) / 1e9
            results[(IN, OUT, mode)] = per
            print(f"[{IN:5d}x{OUT:5d}] {mode:14s} {per:7.3f} ms/matmul "
                  f"({gbs:6.1f} GB/s on weight bytes)", flush=True)
            del e
    return results


# ---------------------------------------------------------------------------
# --xla-int4: jnp.int4 storage + XLA-fused dequant dots
# ---------------------------------------------------------------------------

def bench_xla_int4():
    ovh = overhead_ms()
    for IN, OUT, L in SHAPES:
        key = jax.random.PRNGKey(IN + OUT)
        q8 = jax.random.randint(key, (L, IN, OUT), -8, 8, dtype=jnp.int8)
        try:
            q4 = q8.astype(jnp.int4)
        except Exception as e:  # noqa: BLE001 — dtype support probe
            print(f"jnp.int4 unsupported: {e}", flush=True)
            return
        s = jnp.full((L, 1, OUT), 1e-2, jnp.float32)
        print(f"[{IN}x{OUT}] jnp.int4 on-device bytes/elt (expect 0.5 if "
              f"packed): {q4.nbytes / q4.size}", flush=True)

        variants = {
            # per-channel fused dequant into a bf16 dot (the int8 pattern)
            "xla_i4_bf16dot": lambda x, q, sc: (
                x @ (q.astype(jnp.bfloat16) * sc.astype(jnp.bfloat16))),
            # int8 MXU dot with the int4 operand upcast in the dot
            "xla_i4_i8dot": lambda x, q, sc: (
                jax.lax.dot_general(
                    jnp.clip(jnp.round(x.astype(jnp.float32) * 127), -127,
                             127).astype(jnp.int8),
                    q.astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * sc[0] / 127.0),
        }
        for name, fn in variants.items():
            @jax.jit
            def run(q4, s, x0, fn=fn):
                def body(x, es):
                    q, sc = es
                    y = fn(x, q, sc)
                    return x + y[..., :1].astype(x.dtype) * 1e-24, None

                def outer(i, x):
                    x, _ = jax.lax.scan(body, x, (q4, s))
                    return x

                x = jax.lax.fori_loop(0, K_CHAIN, outer, x0)
                return jnp.sum(x.astype(jnp.float32))

            x0 = jax.random.normal(jax.random.PRNGKey(1), (1, IN),
                                   jnp.bfloat16)
            try:
                total = timed_ms(run, q4, s, x0)
                per = (total - ovh) / (K_CHAIN * L)
                gbs = (IN * OUT // 2) / (per * 1e-3) / 1e9
                print(f"[{IN:5d}x{OUT:5d}] {name:14s} {per:7.3f} ms/matmul"
                      f" ({gbs:6.1f} GB/s if stored packed)", flush=True)
            except Exception as e:  # noqa: BLE001 — lowering probe
                print(f"[{IN:5d}x{OUT:5d}] {name:14s} FAILS "
                      f"({str(e)[:100]})", flush=True)
        del q8, q4
        break   # one shape decides; full sweep only if it's competitive


# ---------------------------------------------------------------------------
# --decode: full-7B decode ablations
# ---------------------------------------------------------------------------

def make_decode(cfg, headless=False):
    from vstar_tpu.nn.llama import (embed_tokens, init_cache, llama_forward,
                                    lm_logits)

    @jax.jit
    def decode_t(params, seed):
        cache = init_cache(cfg, 1, 512, jnp.bfloat16)
        cache = cache._replace(length=jnp.full((1,), 384, jnp.int32))
        tok = jnp.full((1, 1), 17, jnp.int32)

        def one(i, carry):
            cache, x = carry
            h = embed_tokens(params, tok, jnp.bfloat16) + x * 1e-9
            pos = cache.length[:, None]
            hidden, cache = llama_forward(params, cfg, h, pos,
                                          cache.length + 1,
                                          q_offsets=cache.length,
                                          cache=cache)
            out = (hidden.mean() if headless
                   else lm_logits(params, hidden).mean())
            return cache, out.astype(x.dtype)

        return jax.lax.fori_loop(0, K_DECODE, one, (cache, seed))[1]

    return decode_t


def bench_decode():
    from vstar_tpu.core.config import vsm_7b
    from vstar_tpu.nn.llama import init_llama_params
    from vstar_tpu.nn.quant import set_act_int8

    cfg = vsm_7b().llama
    print("init int8 7B decoder (first relay init is 100-220 s)...",
          flush=True)
    p8 = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                           quantize=True)
    jax.block_until_ready(p8["lm_head"]["q"])
    print("init int4 7B decoder...", flush=True)
    p4 = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                           quantize="int4")
    jax.block_until_ready(p4["lm_head"]["q4"])

    mixed_head8 = dict(p4, lm_head=p8["lm_head"])     # int4 stack, int8 head
    mixed_layers8 = dict(p8, lm_head=p4["lm_head"])   # int8 stack, int4 head

    dec = make_decode(cfg)
    dec_headless = make_decode(cfg, headless=True)
    seed = jnp.float32(1.0)

    rows = []

    def row(name, fn, params, act8):
        set_act_int8(act8)
        try:
            ms = timed_ms(lambda s: fn(params, s), seed) / K_DECODE
        finally:
            set_act_int8(False)
        rows.append((name, ms))
        print(f"{name:44s} {ms:7.2f} ms/tok", flush=True)

    row("int8 (XLA fused dequant)", dec, p8, False)
    row("int8, headless (no lm_head)", dec_headless, p8, False)
    row("int4 W4A16", dec, p4, False)
    row("int4 W4A8 (act-int8)", dec, p4, True)
    row("int4 W4A8, headless", dec_headless, p4, True)
    row("int4 layers + int8 lm_head (W4A8)", dec, mixed_head8, True)
    row("int8 layers + int4 lm_head (W4A8)", dec, mixed_layers8, True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--matmul", action="store_true")
    ap.add_argument("--xla-int4", action="store_true")
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--modes", nargs="*",
                    default=["int8", "w4a16", "w4a8", "w4a8_pc",
                             "w4a8_bo512"])
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if args.probe:
        probe_mosaic()
    if args.matmul:
        bench_matmuls(args.modes)
    if args.xla_int4:
        bench_xla_int4()
    if args.decode:
        bench_decode()


if __name__ == "__main__":
    main()
