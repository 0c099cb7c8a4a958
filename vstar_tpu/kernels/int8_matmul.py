"""Pallas fused int8 weight-only matmul (EXPERIMENTAL, not on the hot
path).

Measured on v5e: XLA already fuses the int8->bf16 dequant into the scan-
level matvecs at ~480 GB/s effective (16.2 ms/token for the 7B int8
decoder); this kernel's grid-per-output-block structure measured slower
(19.5 ms/token end-to-end), so `nn/llama.py` keeps the XLA path. Kept as
the starting point for a double-buffered streaming variant.

y[b, o] = sum_i x[b, i] * (w_q[i, o] * s[o])

Grid over output blocks; the full x (small at decode: [B<=16, in<=11008])
stays resident. Used for S*B rows <= DECODE_ROW_LIMIT; prefill keeps the
XLA path (MXU-bound there, not bandwidth-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, wq_ref, s_ref, o_ref, *, block_o: int):
    x = x_ref[...].astype(jnp.float32)          # [B, IN]
    w = wq_ref[...].astype(jnp.float32)         # [IN, block_o]
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def int8_matvec(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                block_o: int = 512, out_dtype=None) -> jnp.ndarray:
    """x [B, IN] @ dequant(wq [IN, OUT], scale [1, OUT]) -> [B, OUT]."""
    B, IN = x.shape
    OUT = wq.shape[1]
    out_dtype = out_dtype or x.dtype
    for cand in (block_o, 256, 128):
        if OUT % cand == 0:
            block_o = cand
            break
    assert OUT % block_o == 0, (OUT, block_o)
    return pl.pallas_call(
        functools.partial(_kernel, block_o=block_o),
        grid=(OUT // block_o,),
        in_specs=[
            pl.BlockSpec((B, IN), lambda j: (0, 0)),
            pl.BlockSpec((IN, block_o), lambda j: (0, j)),
            pl.BlockSpec((1, block_o), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_o), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, OUT), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * IN * OUT,
            bytes_accessed=IN * OUT + 4 * OUT + 2 * B * (IN + OUT),
            transcendentals=0),
    )(x, wq, scale)


# Rows (B*S) below this use the fused kernel; above it, the MXU-bound XLA
# path wins.
DECODE_ROW_LIMIT = 16


def qdot_fast(x: jnp.ndarray, entry) -> jnp.ndarray:
    """Drop-in for nn.quant.qdot with the pallas decode path on TPU."""
    from ..nn.quant import qdot

    if not (isinstance(entry, dict) and "q" in entry):
        return qdot(x, entry)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    IN = x.shape[-1]
    OUT = entry["q"].shape[-1]
    if (not on_tpu or rows > DECODE_ROW_LIMIT or IN % 128 or OUT % 128
            or entry["q"].ndim != 2):
        return qdot(x, entry)
    y = int8_matvec(x.reshape(rows, IN), entry["q"],
                    entry["s"].reshape(1, OUT))
    return y.reshape(*lead, OUT)
