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


def _kernel(xe_ref, xo_ref, q4_ref, s4_ref, o_ref, *, ng: int, gh: int):
    """Two-dot formulation: the even-index input stream hits the low
    nibbles, the odd stream the high nibbles — no interleave reshape, and
    every weight-sized temp is [IN/2, BO] instead of [IN, BO]. Nibble
    arithmetic widens to int32 first (Mosaic has no int8 vector subtract:
    'failed to legalize arith.subi' on vector<...xi8>, measured r4)."""
    qp = q4_ref[...].astype(jnp.int32)                # [IN2, BO]
    in2, bo = qp.shape
    s = s4_ref[...]                                   # [NG, BO] f32
    # packed row k holds elements 2k (lo) and 2k+1 (hi); both live in
    # group k // (group/2), so one scale map serves both nibble streams
    sfull = jnp.broadcast_to(s[:, None, :], (ng, gh, bo)).reshape(in2, bo)
    wl = (((qp & 0xF).astype(jnp.float32) - 8.0) * sfull
          ).astype(jnp.bfloat16)
    wh = (((qp >> 4).astype(jnp.float32) - 8.0) * sfull
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
