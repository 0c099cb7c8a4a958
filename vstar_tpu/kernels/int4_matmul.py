"""Pallas fused int4 weight matmul: unpack + group dequant + dot in VMEM.

Why this kernel exists: the decode hot loop is HBM-bandwidth bound on
weight reads (docs/ROOFLINE.md — int8 7B decode sits at ~65% of the
819 GB/s v5e peak, re-reading ~6.7 GB per token). Group-wise int4 halves
the bytes again (~3.4 GB/token), but XLA does NOT fuse the nibble unpack
into the matvec: the pure-XLA `x @ _deq4(entry)` path materializes the
unpacked weights and measured 300 ms/token (`nn/quant.py`
quantize_weight_int4 docstring, r2). This kernel does the unpack,
group-scale dequant, and dot inside one VMEM-resident block per grid
step, so HBM only ever sees the packed nibbles + scales.

The earlier per-output-block Pallas *int8* matvec lost to XLA's fused
dequant (19.5 vs 16.2 ms/token, `kernels/int8_matmul.py`) because it
reads the same bytes with worse scheduling. int4 changes the math: even
at that kernel's measured ~345 GB/s effective, half the bytes beat the
XLA int8 path's 16 ms (measured result in BASELINE.md r4).

Storage format (from `nn/quant.quantize_weight_int4`):
  q4  uint8 [IN/2, OUT] — consecutive input pairs packed lo | hi<<4
      (element 2k in the low nibble, 2k+1 in the high nibble)
  s4  f32   [IN/group, OUT] — symmetric per-(group, out-channel) scales

Replaces the reference's optional bitsandbytes 4-bit load path
(/root/reference/LLaVA/llava/model/builder.py:28-41) with a TPU-native
scheme. Accuracy: group-128 symmetric int4 is the standard weight-only
4-bit recipe, but like W8A8 it is OPT-IN pending real-checkpoint
validation (`scripts/validate_weights.py --sweep` covers it day-one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ng: int, gh: int):
    """Two-dot formulation: the even-index input stream hits the low
    nibbles, the odd stream the high nibbles — no interleave reshape, and
    every weight-sized temp is [IN/2, BO] instead of [IN, BO]. Nibble
    arithmetic widens to int32 first (Mosaic has no int8 vector subtract:
    'failed to legalize arith.subi' on vector<...xi8>, measured r4).
    Nibbles are stored two's-complement signed (so the W4A8 kernel can
    bitcast-read them); `(n ^ 8) - 8` re-signs them here."""
    qp = q4_ref[...].astype(jnp.int32)                # [IN2, BO]
    in2, bo = qp.shape
    s = s4_ref[...]                                   # [NG, BO] f32
    # packed row k holds elements 2k (lo) and 2k+1 (hi); both live in
    # group k // (group/2), so one scale map serves both nibble streams
    sfull = jnp.broadcast_to(s[:, None, :], (ng, gh, bo)).reshape(in2, bo)
    wl = ((((qp & 0xF) ^ 8).astype(jnp.float32) - 8.0) * sfull
          ).astype(jnp.bfloat16)
    wh = (((((qp >> 4) & 0xF) ^ 8).astype(jnp.float32) - 8.0) * sfull
          ).astype(jnp.bfloat16)
    xe = xe_ref[...].astype(jnp.bfloat16)             # [BR, IN2]
    xo = xo_ref[...].astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    y = (jax.lax.dot_general(xe, wl, dims,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(xo, wh, dims,
                               preferred_element_type=jnp.float32))
    o_ref[...] = y.astype(o_ref.dtype)


def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s4: jnp.ndarray,
                out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x [R, IN] @ dequant(q4 [IN/2, OUT], s4 [IN/group, OUT]) -> [R, OUT].

    Grid: (row blocks, out blocks), out innermost — at decode (R <= 16)
    the weights stream through VMEM exactly once. Per-block VMEM at
    BO=256, IN=11008: packed 1.4 MB (+ pipeline buffer) + bf16 dequant
    5.6 MB + x/out, comfortably under the 16 MB budget.
    """
    R, IN = x.shape
    IN2, OUT = q4.shape
    NG = s4.shape[0]
    assert IN == 2 * IN2, (x.shape, q4.shape)
    assert IN % NG == 0, (IN, NG)
    group = IN // NG
    assert group % 2 == 0, group
    out_dtype = out_dtype or x.dtype

    block_o = None
    for cand in (512 if IN <= 8192 else 256, 256, 128):
        if OUT % cand == 0:
            block_o = cand
            break
    if block_o is None:
        return None  # caller falls back to the XLA path

    if R <= 16:
        block_r, rows_pad = R, R
    else:
        block_r = 128
        rows_pad = ((R + block_r - 1) // block_r) * block_r
        if rows_pad != R:
            x = jnp.pad(x, ((0, rows_pad - R), (0, 0)))
    xe = x[:, 0::2]
    xo = x[:, 1::2]

    y = pl.pallas_call(
        functools.partial(_kernel, ng=NG, gh=group // 2),
        grid=(rows_pad // block_r, OUT // block_o),
        in_specs=[
            pl.BlockSpec((block_r, IN2), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, IN2), lambda i, j: (i, 0)),
            pl.BlockSpec((IN2, block_o), lambda i, j: (0, j)),
            pl.BlockSpec((NG, block_o), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_r, block_o), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, OUT), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * IN * OUT,
            bytes_accessed=(rows_pad // block_r) * (IN2 * OUT + 4 * NG * OUT)
            + 2 * rows_pad * (IN + OUT),
            transcendentals=0),
        interpret=interpret,
    )(xe, xo, q4, s4)
    return y[:R] if rows_pad != R else y


def _w4a8_kernel(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ng: int,
                 gh: int):
    """W4A8: int8 activations against 16x-scaled signed nibbles on the
    int8 MXU path — the unpack is one u8 AND + a free bitcast on the high
    stream and a widened shift+mask on the low stream, then per-group
    int32 dots with the f32 scale applied AFTER each group's dot (the
    1/16 from the nibble pre-scaling is folded into the scale read).

    Measured r5 on the v5e with VALID microbenches (scan over 32-64
    DISTINCT stacked weights, carry-coupled activations — the r4
    chained-same-operand numbers were hoist-contaminated and are
    retracted; scripts/int4_profile.py):

        shape          int8-XLA      this kernel (bo=256 / bo=512)
        4096x4096      0.023 ms      0.065 / 0.057 ms  (130/148 GB/s)
        4096x11008     0.097 ms      0.110 ms          (205 GB/s)
        11008x4096     0.056 ms      0.158 / 0.149 ms  (143/151 GB/s)
        4096x32000     0.283 ms      0.261 ms          (251 GB/s)

    Per-layer sums reproduce the decode-level gap exactly (int4 7B
    decode ~2x int8 despite half the bytes). Optimization hypotheses
    TESTED AND FALSIFIED r5 (don't re-run blind, int4_profile.py keeps
    the probes): (a) VPU unpack arithmetic — bit-equal variants cutting
    the 4 i32-lane lo-unpack ops to 2-3 u8 ANDs measure FLAT; (b) DMA
    contiguity — transposed q4t[OUT,IN2] full-row blocks measure WORSE
    (98-145 GB/s; HBM layout is (8,128)-tiled, not row-major, so column
    blocks were never strided); (c) per-group dot loop — a per-channel
    (ng=1) variant gains only ~5%. The one real win, block_o=512 where
    OUT divides (+8-10%), is the shipping default. Earlier r4 variants
    that measured worse under the (invalid) chained regime: grid-over-
    groups, one-AND mixed-offset storage, i32 sublane-packed unpack,
    astype-truncation lo path. Mosaic miscompiles found while getting
    here: `u8 >> n`, u8/i8 +/*, and batched dot_general all crash the
    compiler; int32-accum dots contracting dim1-vs-dim1 are
    NotImplemented (pre-transpose the activations); `(q & 0xF)
    .astype(f32) * s` WITHOUT a subtract mis-lowers silently (garbage
    values) — every surviving op here is probe-verified (tests pin
    parity in interpret mode + on-chip).

    Consequence for serving: int4 stays the RESIDENCY lever, not a
    speed lever — the pair-on-one-chip modes pay ~2x on decoded tokens,
    so mixed-precision co-residency (int8 VQA + int4 VSM,
    scripts/coresident_bench.py --mixed) keeps the dominant free-form/
    MC phases at int8 speed. A second measured lever follows from this
    table: quantize='int4mix' (nn/quant.INT4MIX_INT4_KEYS) keeps int4
    only where it is at/near parity (gate/up, lm_head) and upgrades
    qkvo+down to int8 — 7B decode 24.2 ms/tok vs int4's 31.6 (1.30x)
    for +1.8 GB of residency (scripts/int4_bench.py r5)."""
    qp = q4_ref[...]                                  # [IN2, BO] u8
    lo16 = ((qp.astype(jnp.int32) << 4) & 0xF0).astype(jnp.int8)
    hi16 = pltpu.bitcast(qp & jnp.uint8(0xF0), jnp.int8)
    xe = xe_ref[...]                                  # [R, IN2] int8
    xo = xo_ref[...]
    s = s4_ref[...] * (1.0 / 16.0)                    # [NG, BO] f32
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


def int4_matmul_w4a8(xq: jnp.ndarray, q4: jnp.ndarray, s4: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """xq int8 [R, IN] @ signed-nibble int4 weights -> f32 [R, OUT]
    (activation scale NOT applied — the caller multiplies by sx).

    Decode-shaped only (R <= 16): at larger R the weight re-reads per
    row block make the W4A16 kernel / XLA dequant the better path, so
    this returns None and the caller falls back."""
    R, IN = xq.shape
    IN2, OUT = q4.shape
    NG = s4.shape[0]
    if R > 16 or IN != 2 * IN2 or IN % NG or IN % 256:
        return None
    gh = IN2 // NG
    # 512 where OUT divides: measured +8-10% over 256 (r5, valid
    # distinct-weight scans); Mosaic streams the i32 widen in chunks so
    # the [IN2, 512] block's temporaries stay inside VMEM
    block_o = next((b for b in (512, 256, 128) if OUT % b == 0), None)
    if block_o is None:
        return None
    xe = xq[:, 0::2]
    xo = xq[:, 1::2]
    return pl.pallas_call(
        functools.partial(_w4a8_kernel, ng=NG, gh=gh),
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
        interpret=interpret,
    )(xe, xo, q4, s4)


def qdot4_w4a8(x: jnp.ndarray, entry) -> jnp.ndarray:
    """W4A8 qdot: per-token int8 activation quant + the fused kernel.
    Returns None (caller falls back to the W4A16 path) off-TPU, on
    stacked entries, or on shapes the kernel declines."""
    q4, s4 = entry["q4"], entry["s4"]
    if q4.ndim != 2:
        return None
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend probe
        on_tpu = False
    if not on_tpu:
        return None
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    IN = x.shape[-1]
    if rows > 16 or IN != 2 * q4.shape[0] or IN % s4.shape[0] or IN % 256:
        return None
    xf = x.reshape(rows, IN).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = int4_matmul_w4a8(xq, q4, s4.astype(jnp.float32))
    if y is None:
        return None
    return (y * sx).astype(x.dtype).reshape(*lead, q4.shape[1])


def qdot4(x: jnp.ndarray, entry) -> jnp.ndarray:
    """x [..., IN] against an int4 entry {'q4','s4'} via the fused kernel;
    returns None when the shape doesn't fit the kernel (caller falls back
    to the XLA dequant path)."""
    q4, s4 = entry["q4"], entry["s4"]
    if q4.ndim != 2:
        return None
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend probe
        on_tpu = False
    if not on_tpu:
        return None
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    IN = x.shape[-1]
    if IN != 2 * q4.shape[0] or IN % s4.shape[0] or IN % 256:
        return None
    y = int4_matmul(x.reshape(rows, IN), q4,
                    s4.astype(jnp.float32))
    if y is None:
        return None
    return y.reshape(*lead, q4.shape[1])
