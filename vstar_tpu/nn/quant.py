"""Weight-only int8 quantization for the LLaMA decoder.

Serving seal-7B on a single 16 GB v5e chip needs < bf16 weights: per-output-
channel symmetric int8 halves the decoder's HBM footprint and decode-time
weight bandwidth (the decode bottleneck). XLA fuses the int8->bf16 convert
and scale into the dot operand, so no dequantized copy is materialized.

Replaces the reference's optional bitsandbytes 4/8-bit load path
(LLaVA/llava/model/builder.py:28-41) with a TPU-native scheme.
"""

from __future__ import annotations

from typing import Dict, Union

import jax.numpy as jnp

WeightEntry = Union[jnp.ndarray, Dict[str, jnp.ndarray]]


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """w: [..., in, out] float -> {'q': int8, 's': f32 per-out-channel}.
    The reduction (in) axis shares a scale so dequant fuses into the dot."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def quantize_weight_np(w) -> Dict:
    """Host-side (numpy) twin of quantize_weight, identical math — used
    by the checkpoint importers so real 7B weights quantize per-tensor on
    the HOST and only int8 + scales ever upload (a device-side pass would
    materialize the full bf16 decoder plus f32 temporaries in HBM)."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    scale = np.maximum(np.max(np.abs(wf), axis=-2, keepdims=True) / 127.0,
                       1e-8)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {"q": q, "s": scale}


def quantize_weight_int4_np(w, group: int = 128) -> Dict:
    """Host-side (numpy) twin of quantize_weight_int4 — identical math,
    identical packed layout — so real checkpoints import straight to int4
    without the full-precision decoder ever touching HBM (the int8
    importer's quantize_weight_np pattern)."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    IN, OUT = wf.shape[-2], wf.shape[-1]
    if IN % group != 0:
        group = IN
    assert IN % 2 == 0, IN
    g = wf.reshape(wf.shape[:-2] + (IN // group, group, OUT))
    scale = np.maximum(np.abs(g).max(axis=-2, keepdims=True) / 7.0, 1e-8)
    q = (np.clip(np.round(g / scale), -8, 7).astype(np.int8) & 0xF)
    q = q.reshape(wf.shape[:-2] + (IN, OUT)).astype(np.uint8)
    packed = (q[..., 0::2, :] | (q[..., 1::2, :] << 4)).astype(np.uint8)
    return {"q4": packed, "s4": scale[..., 0, :].astype(np.float32)}


GROUP4 = 128  # int4 group size along the reduction dim

# Per-matrix recipe for quantize='int4mix': keep int4 ONLY where the
# fused int4 kernel measured at/near parity with the int8 XLA matvec
# (the valid truth table in kernels/int4_matmul.py — 4096x11008 gate/up
# 0.110 vs 0.097 ms, 4096x32000 lm_head 0.261 vs 0.283); upgrade to
# per-channel int8 where XLA sits AT its roofline and the int4 kernel is
# 2.5-2.7x slower (qkvo 0.023 vs 0.057, down 0.056 vs 0.149). At 7B this
# trades +1.8 GB of decoder residency for cutting the decode-critical
# per-layer matmul time from 0.597 to 0.368 ms. MEASURED r5 at 7B
# (scripts/int4_bench.py, same session): decode 24.2 ms/tok vs int4's
# 31.6 and int8's 15.1 (1.30x over int4, the truth table's predicted
# -7.3 ms/tok lands at -7.4); prefill-384 45.6 ms vs int4's 50.8.
INT4MIX_INT4_KEYS = ("w_gate", "w_up", "lm_head")


def resolve_matrix_quant(quantize, name: str):
    """Per-weight quantize mode: 'int4mix' picks int4/int8 by matrix name
    (INT4MIX_INT4_KEYS); every other mode applies uniformly."""
    if quantize == "int4mix":
        return "int4" if name in INT4MIX_INT4_KEYS else "int8"
    return quantize


def quantize_weight_int4(w: jnp.ndarray, group: int = GROUP4
                         ) -> Dict[str, jnp.ndarray]:
    """Group-wise symmetric int4, two nibbles packed per uint8.

    Served by the fused Pallas kernels (kernels/int4_matmul.py): W4A16
    (bf16 activations, ~31 ms/tok 7B decode) or W4A8 with the act-int8
    opt-in (int8 MXU dots, ~30 ms/tok). Both run ~2x slower than the
    int8 XLA path's 16 ms/tok despite half the bytes — the honest
    per-matmul table and the falsified optimization hypotheses live in
    kernels/int4_matmul.py (r5; the r4 "decode parity with int8"
    microbench was hoist-contaminated and is retracted). The pure-XLA
    `x @ _deq4(...)` fallback measured 300 ms/token (XLA does not fuse
    the nibble unpack into the matvec) and exists for CPU/parity only.
    int8 remains the single-model serving default; int4 is the
    RESIDENCY opt-in that fits the 7B pair on one chip (accuracy
    pending real checkpoints, like W8A8) — pair it with an int8 VQA
    engine (mixed-precision co-residency) so only searches pay int4.

    w: [..., in, out] with in % group == 0 ->
    {'q4': uint8 [..., in/2, out] (consecutive pairs packed lo|hi<<4,
           nibbles stored as TWO'S-COMPLEMENT signed 4-bit — the W4A8
           kernel reads `q & 0xF0` directly as int8 = 16*value, so the
           signed encoding makes that bitcast exact with zero unpack
           arithmetic on the high stream; measured r4),
     's4': f32 [..., in/group, out]}"""
    wf = w.astype(jnp.float32)
    lead = wf.shape[:-2]
    IN, OUT = wf.shape[-2], wf.shape[-1]
    if IN % group != 0:
        group = IN  # small dims: one group (per-channel int4)
    assert IN % 2 == 0, IN
    g = wf.reshape(lead + (IN // group, group, OUT))
    scale = jnp.maximum(jnp.max(jnp.abs(g), axis=-2, keepdims=True) / 7.0,
                        1e-8)
    q = jnp.clip(jnp.round(g / scale), -8, 7).astype(jnp.int8) & 0xF
    q = q.reshape(lead + (IN, OUT)).astype(jnp.uint8)
    packed = (q[..., 0::2, :] | (q[..., 1::2, :] << 4)).astype(jnp.uint8)
    return {"q4": packed, "s4": scale[..., 0, :]}


def _deq4(entry: Dict, dtype) -> jnp.ndarray:
    # nibbles are two's-complement signed: n ^ 8 - 8 re-signs ([0,7] -> n,
    # [8,15] -> n - 16)
    qp = entry["q4"]
    lead = qp.shape[:-2]
    IN2, OUT = qp.shape[-2], qp.shape[-1]
    lo = ((qp & 0xF) ^ 8).astype(jnp.int8) - 8
    hi = (((qp >> 4) & 0xF) ^ 8).astype(jnp.int8) - 8
    w = jnp.stack([lo, hi], axis=-2)              # [..., IN/2, 2, OUT]
    w = w.reshape(lead + (IN2 * 2, OUT))
    s = entry["s4"]
    G = (IN2 * 2) // s.shape[-2]
    w = w.reshape(lead + (s.shape[-2], G, OUT)).astype(dtype)
    w = w * s[..., :, None, :].astype(dtype)
    return w.reshape(lead + (IN2 * 2, OUT))


# Trace-time switch for the EXPERIMENTAL W8A8 path: per-token dynamic
# activation int8 against the per-channel int8 weights, accumulating in
# int32 on the MXU (v5e int8 peak ~2x bf16). Off by default — naive W8A8
# is known to be accuracy-fragile on LLaMA activations (outlier channels);
# enable only for measurement (scripts/w8a8_bench.py) or after validating
# greedy/argmin parity on real checkpoints.
_ACT_INT8 = False


def set_act_int8(on: bool):
    """Set BEFORE tracing/jit; read at trace time, baked into the program."""
    global _ACT_INT8
    _ACT_INT8 = bool(on)


def _w8a8_dot(x: jnp.ndarray, entry: Dict) -> jnp.ndarray:
    import jax
    sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                             keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    q = entry["q"]
    acc = jax.lax.dot_general(
        xq, q, (((x.ndim - 1,), (q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * entry["s"][..., 0, :]
    return out.astype(x.dtype)


def qdot(x: jnp.ndarray, entry: WeightEntry) -> jnp.ndarray:
    """x @ W for a raw or quantized (int8 per-channel / int4 group-wise)
    weight entry."""
    if isinstance(entry, dict) and "q4" in entry:
        # the fused Pallas unpack+dequant+dot kernels are the only viable
        # int4 paths on TPU (the XLA expression below measured 300 ms/tok);
        # they return None off-TPU or on shapes they don't tile. With the
        # act-int8 opt-in, decode-shaped rows take the W4A8 kernel (int8
        # MXU dots); everything else takes the bf16-dot W4A16 kernel.
        # Both run ~2x slower than the int8 XLA matvec per matrix on
        # qkvo/down (unpack-compute-bound — the honest truth table lives
        # in kernels/int4_matmul.py; the r4 "decode parity" claim was
        # hoist-contaminated and is retracted). int4 buys RESIDENCY;
        # 'int4mix' keeps int4 only where it holds parity or wins.
        from ..kernels.int4_matmul import qdot4, qdot4_w4a8
        if _ACT_INT8:
            y = qdot4_w4a8(x, entry)
            if y is not None:
                return y
        y = qdot4(x, entry)
        if y is not None:
            return y
        return x @ _deq4(entry, x.dtype)
    if isinstance(entry, dict) and "q" in entry:
        if _ACT_INT8:
            return _w8a8_dot(x, entry)
        w = entry["q"].astype(x.dtype) * entry["s"].astype(x.dtype)
        return x @ w
    return x @ entry.astype(x.dtype)


_LLAMA_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_params(llama_params: Dict) -> Dict:
    """Quantize the decoder's large matmul weights (layers + lm_head);
    embeddings and norms stay high-precision."""
    out = dict(llama_params)
    layers = {k: dict(v) for k, v in llama_params["layers"].items()}
    for group in ("attn", "mlp"):
        for k in list(layers[group].keys()):
            if k in _LLAMA_QUANT_KEYS:
                layers[group][k] = quantize_weight(layers[group][k])
    out["layers"] = layers
    out["lm_head"] = quantize_weight(llama_params["lm_head"])
    return out


def dequantize_weight(entry: WeightEntry, dtype=jnp.float32) -> jnp.ndarray:
    if isinstance(entry, dict) and "q4" in entry:
        return _deq4(entry, jnp.float32).astype(dtype)
    if isinstance(entry, dict) and "q" in entry:
        return (entry["q"].astype(jnp.float32) * entry["s"]).astype(dtype)
    return entry.astype(dtype)


def quantize_vit_params(vit_params: Dict) -> Dict:
    """Per-channel int8 for a ViT tower's dense matmul weights (attn
    qkv/out + MLP; biases, norms, patch/position/class embeddings stay
    high-precision). Halves tower HBM — needed to fit the SEAL 7B PAIR
    plus activations on one 16 GB chip."""
    out = dict(vit_params)
    layers = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in vit_params["layers"].items()}
    for group in ("attn", "mlp"):
        g = dict(layers[group])
        for k, entry in g.items():
            qe = quantize_weight(entry["w"])
            e = {kk: v for kk, v in entry.items() if kk != "w"}
            e["q"], e["s"] = qe["q"], qe["s"]
            g[k] = e
        layers[group] = g
    out["layers"] = layers
    return out


def quantize_model_towers(params: Dict) -> Dict:
    """int8 the ViT towers of a built model pytree (keys 'vision' and,
    for the VSM, 'owl_tower')."""
    out = dict(params)
    for key in ("vision", "owl_tower"):
        if key in out:
            out[key] = quantize_vit_params(out[key])
    return out
