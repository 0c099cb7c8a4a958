"""Tensor/FSDP-sharded inference: the full VSM generate pipeline jitted
over the virtual mesh must equal single-device outputs — the multi-chip
serving path (a capability the reference lacks; its multi-GPU story is HF
device_map layering)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vstar_tpu.core.config import vsm_tiny
from vstar_tpu.core.mesh import DATA_AXIS, shard_params
from vstar_tpu.models.vsm import init_vsm_params, vsm_generate
from vstar_tpu.multimodal.constants import IMAGE_TOKEN_INDEX
from vstar_tpu.multimodal.splicing import build_layout

CFG = vsm_tiny()


def test_sharded_vsm_generate_matches_single_device(cpu_mesh):
    params = init_vsm_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.RandomState(0)
    B = 2
    clip = jnp.asarray(rng.randn(B, 28, 28, 3), jnp.float32)
    owl = jnp.asarray(rng.randn(B, 48, 48, 3), jnp.float32)
    ids = [1, IMAGE_TOKEN_INDEX, 9, 10, 11]
    lay = build_layout(ids, 32, n_long=CFG.image_tokens, n_short=0,
                       image_long=True)
    text = jnp.asarray(np.stack([lay.text_ids] * B))
    fi = jnp.asarray(np.stack([lay.feat_idx] * B))
    isf = jnp.asarray(np.stack([lay.is_feat] * B))
    lens = jnp.asarray([lay.length] * B, jnp.int32)

    def run(params, clip, owl, text, fi, isf, lens):
        return vsm_generate(params, CFG, clip, owl, text, fi, isf, lens,
                            loc_token_id=5, max_new_tokens=4, eos_id=2,
                            cache_len=64, compute_dtype=jnp.float32)

    base = jax.jit(run)(params, clip, owl, text, fi, isf, lens)

    sharded = shard_params(params, cpu_mesh)
    dsh = NamedSharding(cpu_mesh, P(DATA_AXIS))
    with cpu_mesh:
        out = jax.jit(run)(sharded,
                           jax.device_put(clip, dsh),
                           jax.device_put(owl, dsh),
                           jax.device_put(text, dsh),
                           jax.device_put(fi, dsh),
                           jax.device_put(isf, dsh),
                           jax.device_put(lens, dsh))
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(base.tokens))
    np.testing.assert_allclose(np.asarray(out.det_logits),
                               np.asarray(base.det_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mask_logits),
                               np.asarray(base.mask_logits),
                               rtol=1e-4, atol=1e-3)


def test_engine_with_mesh_matches_unsharded(cpu_mesh):
    """VSMEngine(mesh=...) — the CLI --mesh multi-chip serving path —
    must produce the same detections as the unsharded engine."""
    from vstar_tpu.search.engine import VSMEngine
    from tests.test_data import WordTokenizer

    tok = WordTokenizer()
    params = init_vsm_params(jax.random.PRNGKey(5), CFG)
    rng = np.random.RandomState(1)
    from PIL import Image
    img = Image.fromarray((rng.rand(80, 96, 3) * 255).astype("uint8"))

    kw = dict(loc_token_id=tok._word_id("[LOC]"), max_new_tokens=4,
              prompt_buckets=(64, 128), compute_dtype=jnp.float32)
    base = VSMEngine(params, CFG, tok, **kw)
    sharded = VSMEngine(params, CFG, tok, mesh=cpu_mesh, **kw)
    b_boxes, b_logits, b_heat = base.detect(img, "cat")
    s_boxes, s_logits, s_heat = sharded.detect(img, "cat")
    np.testing.assert_allclose(b_boxes, s_boxes, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b_logits, s_logits, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b_heat, s_heat, rtol=1e-3, atol=1e-3)


def test_vqa_engine_with_mesh_matches_unsharded(cpu_mesh):
    from vstar_tpu.core.config import vqa_llm_tiny
    from vstar_tpu.eval.vqa_engine import VQAEngine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from tests.test_data import WordTokenizer

    cfg = vqa_llm_tiny()
    tok = WordTokenizer()
    params = init_vqa_llm_params(jax.random.PRNGKey(6), cfg)
    rng = np.random.RandomState(2)
    from PIL import Image
    img = Image.fromarray((rng.rand(64, 64, 3) * 255).astype("uint8"))

    kw = dict(prompt_buckets=(128,), option_bucket=16,
              compute_dtype=jnp.float32, speculative_template="")
    base = VQAEngine(params, cfg, tok, **kw)
    sharded = VQAEngine(params, cfg, tok, mesh=cpu_mesh, **kw)
    q = "what color is the square ?"
    opts = ["red", "blue", "green"]
    assert base.free_form(img, q, max_new_tokens=4) \
        == sharded.free_form(img, q, max_new_tokens=4)
    assert base.multiple_choice(img, q, opts) \
        == sharded.multiple_choice(img, q, opts)


def test_split_model_placement_across_devices():
    """Per-model chip placement (the SEAL 7B pair exceeds one 16 GB chip;
    load_engines splits VQA -> chip0 / VSM -> chip1): params device_put
    to different devices must produce identical results."""
    from vstar_tpu.search.engine import VSMEngine
    from tests.test_data import WordTokenizer

    devs = jax.devices()
    assert len(devs) >= 2
    tok = WordTokenizer()
    params = init_vsm_params(jax.random.PRNGKey(7), CFG)
    from PIL import Image
    rng = np.random.RandomState(3)
    img = Image.fromarray((rng.rand(60, 80, 3) * 255).astype("uint8"))

    kw = dict(loc_token_id=tok._word_id("[LOC]"), max_new_tokens=4,
              prompt_buckets=(64, 128), compute_dtype=jnp.float32)
    base = VSMEngine(params, CFG, tok, **kw)
    moved = VSMEngine(jax.device_put(params, devs[1]), CFG, tok, **kw)
    b = base.detect(img, "cat")
    m = moved.detect(img, "cat")
    for x, y in zip(b, m):
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-5)
