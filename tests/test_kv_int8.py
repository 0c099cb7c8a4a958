"""int8 KV cache: per-(token, head) quantized k/v with scale sidecars
(nn/llama.init_cache kv_int8=True). Validates (a) numerical closeness of
cached-decode outputs to the bf16/f32 cache, (b) the quantizer's error
bound, (c) engine-level plumbing (VSMEngine kv_int8)."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vstar_tpu.core.config import _tiny_llama, vsm_tiny
from vstar_tpu.nn.llama import (_quantize_kv, embed_tokens, init_cache,
                                init_llama_params, llama_forward)

CFG = _tiny_llama()


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(1), CFG)


def test_quantizer_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3, 16)) * 3.0
    q, s = _quantize_kv(x)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq - x))
    # absmax/127 quantization: error <= scale/2 per element
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()


def test_int8_cache_decode_close_to_f32(params):
    B, S_pre, S_dec = 2, 10, 6
    key = jax.random.PRNGKey(3)
    ids = jax.random.randint(key, (B, S_pre + S_dec), 0, CFG.vocab_size)
    h_all = embed_tokens(params, ids, jnp.float32)
    pos_all = jnp.broadcast_to(jnp.arange(S_pre + S_dec),
                               (B, S_pre + S_dec))

    outs = {}
    for mode in ("f32", "int8"):
        cache = init_cache(CFG, B, 32, dtype=jnp.float32,
                           kv_int8=(mode == "int8"))
        pre_lens = jnp.full((B,), S_pre, jnp.int32)
        out, cache = llama_forward(
            params, CFG, h_all[:, :S_pre], pos_all[:, :S_pre], pre_lens,
            q_offsets=jnp.zeros((B,), jnp.int32), cache=cache)
        seq = [out]
        for t in range(S_pre, S_pre + S_dec):
            step, cache = llama_forward(
                params, CFG, h_all[:, t:t + 1], pos_all[:, t:t + 1],
                cache.length + 1, q_offsets=cache.length, cache=cache)
            seq.append(step)
        outs[mode] = np.concatenate([np.asarray(s) for s in seq], axis=1)

    # int8 KV introduces <1% relative error on hidden states — far below
    # the option-CE separation / accept-threshold margins the SEAL
    # decisions run on
    ref = outs["f32"]
    diff = np.abs(outs["int8"] - ref)
    rel = diff.max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_int8_cache_halves_bytes():
    c8 = init_cache(CFG, 2, 32, kv_int8=True)
    c16 = init_cache(CFG, 2, 32, dtype=jnp.bfloat16)

    def nbytes(c):
        tot = c.k.size * c.k.dtype.itemsize + c.v.size * c.v.dtype.itemsize
        if c.k_scale is not None:
            tot += (c.k_scale.size * 4 + c.v_scale.size * 4)
        return tot

    # scales add 1/Dh overhead in f32 = 4/Dh relative; still ~2x smaller
    assert nbytes(c8) < 0.65 * nbytes(c16) * 2  # int8+scales vs bf16
    assert nbytes(c8) <= nbytes(c16) * (0.5 + 2.0 / CFG.head_dim) + 64


def test_vsm_engine_kv_int8_runs():
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.engine import VSMEngine

    cfg = vsm_tiny()

    class Tok:
        bos_token_id = 1
        eos_token_id = 2

        class _O:
            def __init__(s, i):
                s.input_ids = i

        def __call__(self, text):
            return self._O([1] + [3 + zlib.crc32(w.encode()) % 200
                                  for w in text.split()])

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{i}" for i in ids if i > 2)

    params = init_vsm_params(jax.random.PRNGKey(11), cfg)
    img = Image.fromarray((np.random.RandomState(0)
                           .rand(96, 128, 3) * 255).astype("uint8"))
    outs = {}
    for kv_int8 in (False, True):
        eng = VSMEngine(params, cfg, Tok(), loc_token_id=3, eos_id=2,
                        max_new_tokens=4, prompt_buckets=(64,),
                        compute_dtype=jnp.float32,
                        speculative_template=None, kv_int8=kv_int8)
        outs[kv_int8] = eng.detect(img, "cat")
    # same token path -> same loc_valid shape behavior; heatmaps close
    h0, h1 = outs[False][2], outs[True][2]
    assert h0.shape == h1.shape
    if h0.max() > 0:
        assert np.abs(h1 - h0).max() / (np.abs(h0).max() + 1e-9) < 0.05


def test_vqa_engine_kv_int8_runs():
    """The VQA engine's free-form + prefix-cache option scoring (the B=8
    KV-bandwidth bottleneck) must run with the int8 cache and agree with
    the f32-cache engine on the chosen option."""
    from vstar_tpu.core.config import vqa_llm_tiny
    from vstar_tpu.eval.vqa_engine import VQAEngine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params

    cfg = vqa_llm_tiny()

    class Tok:
        bos_token_id = 1
        eos_token_id = 2

        class _O:
            def __init__(s, i):
                s.input_ids = i

        def __call__(self, text):
            return self._O([1] + [3 + zlib.crc32(w.encode()) % 200
                                  for w in text.split()])

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{i}" for i in ids if i > 2)

    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg)
    img = Image.fromarray((np.random.RandomState(0)
                           .rand(64, 64, 3) * 255).astype("uint8"))
    picks = {}
    for kv_int8 in (False, True):
        eng = VQAEngine(params, cfg, Tok(), prompt_buckets=(64,),
                        option_bucket=16, compute_dtype=jnp.float32,
                        kv_int8=kv_int8)
        txt = eng.free_form(img, "what is this ?", max_new_tokens=4)
        assert isinstance(txt, str)
        picks[kv_int8] = eng.multiple_choice(
            img, "what is this ?", ["a red cup", "a blue dog"])
    assert picks[False] == picks[True]
