"""Config derivation from checkpoint config.json (core/hf_config.py).

The reference shapes models from the checkpoint's config.json via HF
from_pretrained (LLaVA/llava/model/builder.py:26-151); these tests pin the
pytree importers' equivalent: seal-style config dicts for 7B/13B produce
the right LlamaConfig/projector shapes, and directories without a
config.json fall back to the 7B presets.
"""

import json
import os

from vstar_tpu.core.config import vqa_llm_7b, vqa_llm_13b, vsm_7b, vsm_13b
from vstar_tpu.core.hf_config import (llama_config_from_hf,
                                      vqa_llm_config_from_hf,
                                      vqa_llm_config_for,
                                      vsm_config_from_hf, vsm_config_for)

SEAL_VQA_7B = {
    "architectures": ["LlavaSearchLlamaForCausalLM"],
    "hidden_size": 4096, "intermediate_size": 11008,
    "num_hidden_layers": 32, "num_attention_heads": 32,
    "max_position_embeddings": 2048, "rms_norm_eps": 1e-6,
    "vocab_size": 32003,
    "mm_hidden_size": 1024,
    "mm_projector_type": "linear",
    "object_mm_projector_type": "perceiver",
    "mm_vision_tower": "openai/clip-vit-large-patch14",
}

SEAL_VSM_7B = {
    "architectures": ["VSMForCausalLM"],
    "hidden_size": 4096, "intermediate_size": 11008,
    "num_hidden_layers": 32, "num_attention_heads": 32,
    "vocab_size": 32003,
    "mm_hidden_size": 1024, "mm_projector_type": "linear",
    "mm_vision_tower": "openai/clip-vit-large-patch14",
    "out_dim": 512, "train_mask_decoder": True,
}


def test_vqa_7b_roundtrip():
    cfg = vqa_llm_config_from_hf(SEAL_VQA_7B)
    ref = vqa_llm_7b()
    assert cfg.llama == ref.llama
    assert cfg.projector_image.type == "linear"
    assert cfg.projector_object.type == "perceiver"
    assert cfg.projector_object.perceiver.num_latents == 32
    assert cfg.image_tokens_long == 256
    assert cfg.image_tokens_short == 32


def test_vsm_7b_roundtrip():
    cfg = vsm_config_from_hf(SEAL_VSM_7B)
    ref = vsm_7b()
    assert cfg.llama == ref.llama
    assert cfg.out_dim == 512 and cfg.seg_dim == 256
    assert cfg.owl_vision == ref.owl_vision
    assert cfg.sam == ref.sam


def test_13b_shapes():
    d13 = dict(SEAL_VQA_7B, hidden_size=5120, intermediate_size=13824,
               num_hidden_layers=40, num_attention_heads=40)
    cfg = vqa_llm_config_from_hf(d13)
    assert cfg.llama == vqa_llm_13b().llama
    assert cfg.llama.head_dim == 128
    assert cfg.projector_image.out_dim == 5120
    assert cfg.projector_object.out_dim == 5120

    v13 = dict(SEAL_VSM_7B, hidden_size=5120, intermediate_size=13824,
               num_hidden_layers=40, num_attention_heads=40)
    vcfg = vsm_config_from_hf(v13)
    assert vcfg.llama == vsm_13b().llama
    assert vcfg.projector.out_dim == 5120


def test_mlp_projector_and_336_tower():
    d = dict(SEAL_VQA_7B, mm_projector_type="mlp2x_gelu",
             mm_vision_tower="openai/clip-vit-large-patch14-336")
    cfg = vqa_llm_config_from_hf(d)
    assert cfg.projector_image.type == "mlp2x_gelu"
    assert cfg.projector_image.mlp_depth == 2
    assert cfg.vision.image_size == 336
    assert cfg.image_tokens_long == 24 * 24


def test_gqa_heads():
    d = dict(SEAL_VQA_7B, num_key_value_heads=8)
    assert llama_config_from_hf(d).num_kv_heads == 8
    assert llama_config_from_hf(SEAL_VQA_7B).num_kv_heads == 32


def test_dir_fallback_and_json(tmp_path):
    # no config.json -> 7B preset
    assert vqa_llm_config_for(str(tmp_path)) == vqa_llm_7b()
    assert vsm_config_for(str(tmp_path)) == vsm_7b()
    # with config.json -> derived
    d13 = dict(SEAL_VSM_7B, hidden_size=5120, intermediate_size=13824,
               num_hidden_layers=40, num_attention_heads=40)
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(d13, f)
    assert vsm_config_for(str(tmp_path)).llama.hidden_size == 5120


def test_projector_types_initializable():
    # every projector type the reference builder supports
    # (multimodal_projector/builder.py:33-70) must init + apply
    import jax
    import jax.numpy as jnp

    from vstar_tpu.core.config import PerceiverConfig, ProjectorConfig
    from vstar_tpu.nn.projectors import (apply_projector,
                                         init_projector_params)
    feats = jnp.ones((1, 6, 8))
    for cfg in [
        ProjectorConfig(type="linear", in_dim=8, out_dim=16),
        ProjectorConfig(type="mlp2x_gelu", in_dim=8, out_dim=16,
                        mlp_depth=2),
        ProjectorConfig(type="identity", in_dim=8, out_dim=8),
        ProjectorConfig(type="perceiver", in_dim=8, out_dim=16,
                        perceiver=PerceiverConfig(dim=8, depth=1,
                                                  dim_head=4, heads=2,
                                                  num_latents=2)),
    ]:
        p = init_projector_params(jax.random.PRNGKey(0), cfg)
        out = apply_projector(p, cfg, feats)
        want_n = 2 if cfg.type == "perceiver" else 6
        want_d = cfg.out_dim if cfg.type != "identity" else 8
        assert out.shape == (1, want_n, want_d), (cfg.type, out.shape)
