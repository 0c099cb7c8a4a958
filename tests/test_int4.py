"""int4 fused-dequant matmul kernel: interpret-mode parity + dispatch.

The Pallas kernel (kernels/int4_matmul.py) is the only viable int4 path
on TPU (the XLA unpack expression measured 300 ms/token); these tests
pin its math to the XLA `_deq4` reference on CPU via interpret mode, and
the `qdot` dispatch contract (falls back to XLA off-TPU, identical
results either way).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstar_tpu.kernels.int4_matmul import int4_matmul, qdot4
from vstar_tpu.nn.quant import (_deq4, dequantize_weight, qdot,
                                quantize_weight_int4)


def _entry(rng, IN, OUT, group=128):
    w = jnp.asarray(rng.randn(IN, OUT), jnp.float32) * 0.05
    return w, quantize_weight_int4(w, group=group)


@pytest.mark.parametrize("rows,IN,OUT,group", [
    (1, 512, 256, 128),      # decode row
    (5, 512, 256, 128),      # small wave, odd rows
    (16, 512, 384, 128),     # row-block boundary, OUT % 128 block
    (130, 512, 256, 128),    # multi row-block with padding
    (2, 512, 256, 512),      # single group (per-channel int4)
])
def test_kernel_matches_xla_dequant(rows, IN, OUT, group):
    rng = np.random.RandomState(0)
    _, e = _entry(rng, IN, OUT, group)
    x = jnp.asarray(rng.randn(rows, IN), jnp.float32)
    y = int4_matmul(x, e["q4"], e["s4"].astype(jnp.float32),
                    interpret=True)
    assert y.shape == (rows, OUT)
    ref = (x.astype(jnp.bfloat16)
           @ _deq4(e, jnp.bfloat16)).astype(jnp.float32)
    # both sides do a bf16 dot; the kernel accumulates f32 on the MXU
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_unpack_order_and_groups():
    """The packed layout (even->lo nibble, odd->hi) and group scaling
    round-trip through dequantize_weight with bounded error."""
    rng = np.random.RandomState(1)
    w, e = _entry(rng, 512, 128, group=128)
    wd = dequantize_weight(e, jnp.float32)
    assert wd.shape == w.shape
    # symmetric int4 with group max scaling: error <= scale/2 per element
    g = np.asarray(w).reshape(4, 128, 128)
    scale = np.abs(g).max(axis=1, keepdims=True) / 7.0
    bound = np.broadcast_to(scale / 2 + 1e-6, g.shape).reshape(w.shape)
    assert (np.abs(np.asarray(wd) - np.asarray(w)) <= bound).all()


@pytest.mark.parametrize("rows,IN,OUT,group", [
    (1, 512, 256, 128),      # decode row
    (8, 512, 256, 128),      # speculative draft wave
    (16, 512, 384, 128),     # row cap, OUT % 128 block
    (2, 512, 256, 512),      # single group (per-channel int4)
])
def test_w4a8_kernel_matches_int_reference(rows, IN, OUT, group):
    """The W4A8 kernel's int8 dots against 16x signed nibbles must equal
    the exact integer reference (scaled in f32) — the int path has no
    rounding, so the tolerance is float-accumulation only."""
    from vstar_tpu.kernels.int4_matmul import int4_matmul_w4a8
    rng = np.random.RandomState(0)
    _, e = _entry(rng, IN, OUT, group)
    xq = jnp.asarray(rng.randint(-127, 128, (rows, IN)), jnp.int8)
    y = int4_matmul_w4a8(xq, e["q4"], e["s4"].astype(jnp.float32),
                         interpret=True)
    assert y.shape == (rows, OUT) and y.dtype == jnp.float32
    # integer reference: unpack signed nibbles, exact int dot, f32 scale
    qp = np.asarray(e["q4"])
    lo = ((qp & 0xF) ^ 8).astype(np.int64) - 8
    hi = (((qp >> 4) & 0xF) ^ 8).astype(np.int64) - 8
    sv = np.zeros((IN, OUT), np.int64)
    sv[0::2], sv[1::2] = lo, hi
    g = IN // np.asarray(e["s4"]).shape[0]
    sf = np.repeat(np.asarray(e["s4"], np.float64), g, axis=0)
    ref = np.asarray(xq, np.int64) @ (sv * sf)
    np.testing.assert_allclose(np.asarray(y, np.float64), ref,
                               rtol=1e-5, atol=1e-5)


def test_w4a8_qdot_declines_prefill_and_off_tpu():
    """qdot4_w4a8 returns None for prefill-sized rows and off-TPU; the
    act-int8 qdot dispatch then falls back to the W4A16/XLA path."""
    from vstar_tpu.kernels.int4_matmul import qdot4_w4a8
    from vstar_tpu.nn.quant import set_act_int8
    rng = np.random.RandomState(5)
    _, e = _entry(rng, 512, 256)
    x = jnp.asarray(rng.randn(1, 512), jnp.bfloat16)
    assert jax.devices()[0].platform != "tpu"
    assert qdot4_w4a8(x, e) is None                 # off-TPU decline
    # prefill-sized rows decline too (off-TPU the platform gate already
    # returns None, so this asserts the combined gate, not rows alone)
    assert qdot4_w4a8(jnp.tile(x, (32, 1)), e) is None
    set_act_int8(True)
    try:
        y = qdot(x, e)                              # falls back, still runs
    finally:
        set_act_int8(False)
    ref = x @ _deq4(e, x.dtype)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_qdot_dispatch_fallback_off_tpu():
    """On CPU qdot4 declines (returns None) and qdot falls back to the
    XLA path — bit-identical to calling it directly."""
    rng = np.random.RandomState(2)
    _, e = _entry(rng, 512, 256)
    x = jnp.asarray(rng.randn(2, 3, 512), jnp.bfloat16)
    assert jax.devices()[0].platform != "tpu"
    assert qdot4(x.reshape(6, 512), e) is None
    y = qdot(x, e)
    ref = x @ _deq4(e, x.dtype)
    assert y.shape == (2, 3, 256)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_qdot4_shape_gates():
    """Shapes the kernel can't tile are declined, not mis-tiled."""
    rng = np.random.RandomState(3)
    _, e = _entry(rng, 512, 200)          # OUT has no 128-multiple tile
    x = jnp.ones((1, 512), jnp.bfloat16)
    assert qdot4(x, e) is None            # declined (off-TPU gate too)
    # stacked (scan) entries are declined
    _, e2 = _entry(rng, 512, 256)
    e2 = {"q4": e2["q4"][None], "s4": e2["s4"][None]}
    assert qdot4(x, e2) is None


def test_np_twin_matches_device_quantizer():
    """quantize_weight_int4_np must produce byte-identical packed weights
    and scales to the jnp quantizer (the importer relies on it)."""
    from vstar_tpu.nn.quant import quantize_weight_int4_np
    rng = np.random.RandomState(4)
    w = rng.randn(512, 192).astype(np.float32) * 0.1
    a = quantize_weight_int4(jnp.asarray(w))
    b = quantize_weight_int4_np(w)
    np.testing.assert_array_equal(np.asarray(a["q4"]), b["q4"])
    np.testing.assert_allclose(np.asarray(a["s4"]), b["s4"], rtol=1e-6)


def test_importer_int4_roundtrip():
    """llama_params_from_torch(quantize='int4') emits q4/s4 stacks whose
    dequant matches quantizing the bf16 import directly."""
    from vstar_tpu.core.config import _tiny_llama
    from vstar_tpu.core.hf_export import llama_state_dict
    from vstar_tpu.core.hf_import import llama_params_from_torch
    from vstar_tpu.nn.llama import init_llama_params
    cfg = _tiny_llama()
    params = init_llama_params(jax.random.PRNGKey(5), cfg)
    sd = llama_state_dict(params)
    q = llama_params_from_torch(sd, cfg, quantize="int4")
    wq = q["layers"]["attn"]["wq"]
    assert set(wq.keys()) == {"q4", "s4"}
    assert wq["q4"].shape[0] == cfg.num_layers
    ref = quantize_weight_int4(params["layers"]["attn"]["wq"][0])
    np.testing.assert_array_equal(np.asarray(wq["q4"][0]),
                                  np.asarray(ref["q4"]))
    lm = q["lm_head"]
    refh = quantize_weight_int4(params["lm_head"])
    np.testing.assert_array_equal(np.asarray(lm["q4"]),
                                  np.asarray(refh["q4"]))


def test_int4mix_init_import_and_forward():
    """quantize='int4mix' builds the per-matrix split recipe (int8 qkvo +
    down, int4 gate/up + lm_head — nn/quant.INT4MIX_INT4_KEYS), the HF
    importer emits the same split, and the forward runs end to end on the
    XLA fallback paths (CPU) with finite outputs."""
    from vstar_tpu.core.config import LlamaConfig
    from vstar_tpu.core.hf_export import llama_state_dict
    from vstar_tpu.core.hf_import import llama_params_from_torch
    from vstar_tpu.nn.llama import (embed_tokens, init_llama_params,
                                    llama_forward, lm_logits)
    cfg = LlamaConfig(num_layers=2, hidden_size=256, intermediate_size=512,
                      num_heads=4, num_kv_heads=4, head_dim=64,
                      vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.bfloat16, quantize="int4mix")
    for k in ("wq", "wk", "wv", "wo"):
        assert set(params["layers"]["attn"][k].keys()) == {"q", "s"}, k
    assert set(params["layers"]["mlp"]["w_down"].keys()) == {"q", "s"}
    for k in ("w_gate", "w_up"):
        assert set(params["layers"]["mlp"][k].keys()) == {"q4", "s4"}, k
    assert set(params["lm_head"].keys()) == {"q4", "s4"}
    ids = jnp.ones((1, 8), jnp.int32)
    h = embed_tokens(params, ids, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    hidden, _ = llama_forward(params, cfg, h, pos,
                              jnp.full((1,), 8, jnp.int32))
    logits = lm_logits(params, hidden)
    assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())
    # importer: same split from a torch state_dict
    base = init_llama_params(jax.random.PRNGKey(5), cfg)
    q = llama_params_from_torch(llama_state_dict(base), cfg,
                                quantize="int4mix")
    assert set(q["layers"]["attn"]["wq"].keys()) == {"q", "s"}
    assert set(q["layers"]["mlp"]["w_gate"].keys()) == {"q4", "s4"}
    assert set(q["lm_head"].keys()) == {"q4", "s4"}


def test_int4_llama_init_and_forward():
    """quantize='int4' builds a decoder whose forward runs end to end on
    the XLA fallback path (CPU) with finite outputs."""
    from vstar_tpu.core.config import LlamaConfig
    from vstar_tpu.nn.llama import (embed_tokens, init_llama_params,
                                    llama_forward, lm_logits)
    cfg = LlamaConfig(num_layers=2, hidden_size=256, intermediate_size=512,
                      num_heads=4, num_kv_heads=4, head_dim=64,
                      vocab_size=128)
    params = init_llama_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.bfloat16, quantize="int4")
    assert "q4" in params["layers"]["attn"]["wq"]
    ids = jnp.ones((1, 8), jnp.int32)
    h = embed_tokens(params, ids, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    hidden, _ = llama_forward(params, cfg, h, pos,
                              jnp.full((1,), 8, jnp.int32))
    logits = lm_logits(params, hidden)
    assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())
