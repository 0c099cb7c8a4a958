"""Weight-only int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import _tiny_llama
from vstar_tpu.nn.llama import (embed_tokens, init_llama_params,
                                llama_forward, lm_logits)
from vstar_tpu.nn.quant import (dequantize_weight, qdot,
                                quantize_llama_params, quantize_weight)

CFG = _tiny_llama()


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8
    deq = dequantize_weight(q)
    err = np.abs(np.asarray(deq - w)).max()
    # per-channel int8: max error <= scale/2 per channel
    max_scale = float(np.asarray(q["s"]).max())
    assert err <= max_scale * 0.51


def test_qdot_matches_dequant():
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    q = quantize_weight(w)
    got = qdot(x, q)
    want = x @ dequantize_weight(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_quantized_llama_forward_close():
    params = init_llama_params(jax.random.PRNGKey(3), CFG)
    qparams = dict(params)
    qparams = quantize_llama_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 12), 0,
                             CFG.vocab_size)
    h = embed_tokens(params, ids, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(12), (1, 12))
    lens = jnp.full((1,), 12, jnp.int32)
    out_f, _ = llama_forward(params, CFG, h, pos, lens)
    out_q, _ = llama_forward(qparams, CFG, h, pos, lens)
    lf = np.asarray(lm_logits(params, out_f))
    lq = np.asarray(lm_logits(qparams, out_q))
    # int8 weight-only on a 2-layer model: logits stay close and the
    # greedy choice agrees
    assert np.abs(lf - lq).max() < 0.35
    assert (lf.argmax(-1) == lq.argmax(-1)).mean() > 0.9
