"""Export roundtrip tests: params -> torch-layout state_dict -> importers."""

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import _tiny_llama, _tiny_vit
from vstar_tpu.core.hf_export import (llama_state_dict, save_safetensors,
                                      vit_state_dict)
from vstar_tpu.core.hf_import import (llama_params_from_torch,
                                      vit_params_from_torch)
from vstar_tpu.nn.llama import init_llama_params
from vstar_tpu.nn.vit import init_vit_params


def _tree_allclose(a, b, rtol=1e-5):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol,
                                   atol=1e-6)


def test_llama_export_import_roundtrip():
    cfg = _tiny_llama()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    sd = llama_state_dict(params)
    back = llama_params_from_torch(sd, cfg)
    _tree_allclose(params, back)


def test_llama_export_merges_lora():
    from vstar_tpu.train.lora import add_lora, merge_lora
    cfg = _tiny_llama()
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    lp = add_lora(params, jax.random.PRNGKey(2))
    lp["layers"]["attn"]["lora"]["wq_b"] = jax.random.normal(
        jax.random.PRNGKey(3),
        lp["layers"]["attn"]["lora"]["wq_b"].shape) * 0.02
    sd = llama_state_dict(lp)
    merged = merge_lora(lp)
    np.testing.assert_allclose(
        sd["model.layers.0.self_attn.q_proj.weight"],
        np.asarray(merged["layers"]["attn"]["wq"][0]).T, rtol=1e-5,
        atol=1e-6)


def test_vit_export_import_roundtrip():
    cfg = _tiny_vit()
    params = init_vit_params(jax.random.PRNGKey(4), cfg)
    sd = vit_state_dict(params, prefix="vision_model.")
    back = vit_params_from_torch(sd, cfg, prefix="vision_model.")
    _tree_allclose(params, back)


def test_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import load_file
    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
          "b.bias": np.ones(4, np.float32)}
    save_safetensors(sd, str(tmp_path / "ckpt"))
    back = load_file(str(tmp_path / "ckpt" / "model.safetensors"))
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
    # and the framework's own loader reads the directory
    from vstar_tpu.core.checkpoint import load_torch_dir
    sd2 = load_torch_dir(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(sd2["a.weight"]), sd["a.weight"])


def test_projector_adapter_roundtrip(tmp_path):
    import jax
    from vstar_tpu.core.checkpoint import (load_projector_adapter,
                                           save_params)
    from vstar_tpu.core.config import vqa_llm_tiny
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    cfg = vqa_llm_tiny()
    p1 = init_vqa_llm_params(jax.random.PRNGKey(0), cfg)
    p2 = init_vqa_llm_params(jax.random.PRNGKey(1), cfg)
    save_params(p1["proj_object"], str(tmp_path / "adapter"))
    merged = load_projector_adapter(p2, str(tmp_path / "adapter"),
                                    "proj_object")
    a = np.asarray(jax.tree_util.tree_leaves(merged["proj_object"])[0])
    b = np.asarray(jax.tree_util.tree_leaves(p1["proj_object"])[0])
    np.testing.assert_array_equal(a, b)
    # other components untouched
    np.testing.assert_array_equal(
        np.asarray(merged["llama"]["embed_tokens"]),
        np.asarray(p2["llama"]["embed_tokens"]))


def test_vsm_export_import_roundtrip():
    import jax
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.core.hf_export import vsm_state_dict
    from vstar_tpu.models.vsm import init_vsm_params, vsm_params_from_torch
    cfg = vsm_tiny()
    params = init_vsm_params(jax.random.PRNGKey(9), cfg)
    sd = vsm_state_dict(params)
    back = vsm_params_from_torch(sd, cfg)
    _tree_allclose(params, back)


def test_torch_import_quantized_decoder_generates():
    """quantize_llm=True (the single-chip 7B serving default in
    load_engines) must import and still run the full generate pipeline."""
    import jax
    import jax.numpy as jnp
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.core.hf_export import vsm_state_dict
    from vstar_tpu.models.vsm import (init_vsm_params,
                                      vsm_params_from_torch, vsm_generate)
    from vstar_tpu.multimodal.constants import IMAGE_TOKEN_INDEX
    from vstar_tpu.multimodal.splicing import build_layout

    cfg = vsm_tiny()
    sd = vsm_state_dict(init_vsm_params(jax.random.PRNGKey(9), cfg))
    qparams = vsm_params_from_torch(sd, cfg, quantize_llm=True)
    assert "q" in qparams["llama"]["lm_head"]   # int8 entry, not a dense W

    rng = np.random.RandomState(0)
    lay = build_layout([1, IMAGE_TOKEN_INDEX, 9, 10], 32,
                       n_long=cfg.image_tokens, n_short=0, image_long=True)
    out = jax.jit(vsm_generate, static_argnames=(
        "cfg", "loc_token_id", "max_new_tokens", "eos_id", "cache_len",
        "compute_dtype"))(
        qparams, cfg,
        jnp.asarray(rng.randn(1, 28, 28, 3), jnp.float32),
        jnp.asarray(rng.randn(1, 48, 48, 3), jnp.float32),
        jnp.asarray(lay.text_ids[None]), jnp.asarray(lay.feat_idx[None]),
        jnp.asarray(lay.is_feat[None]),
        jnp.asarray([lay.length], jnp.int32),
        loc_token_id=5, max_new_tokens=4, eos_id=2, cache_len=64,
        compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out.det_logits, np.float32)).all()
