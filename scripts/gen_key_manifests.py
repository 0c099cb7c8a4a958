"""Generate checkpoint-key manifests for seal_vqa_7b / seal_vsm_7b.

Builds the reference torch models with the REAL depths (LLaMA 32 layers,
CLIP ViT-L 24 layers, OWL-ViT B 12 layers; perceiver/SAM depths are
hardcoded in the reference builders) but tiny widths — state_dict key
names depend only on depth, so the emitted key sets are exactly the real
checkpoints' schemas. The manifest lists the keys the importers CONSUME;
keys in DEFAULT_SKIP_PATTERNS (dead buffers, unused towers) are the only
tolerated extras.

Run from the repo root:  python scripts/gen_key_manifests.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import torch  # noqa: E402

from ref_loader import load_reference  # noqa: E402

from vstar_tpu.core.config import (LlamaConfig, OwlHeadConfig,  # noqa: E402
                                   PerceiverConfig, ProjectorConfig,
                                   SamDecoderConfig, ViTConfig, VQALLMConfig,
                                   VSMConfig)
from vstar_tpu.core.import_audit import (audit_import,  # noqa: E402
                                         manifest_path)
from vstar_tpu.models.vqa_llm import vqa_llm_params_from_torch  # noqa: E402
from vstar_tpu.models.vsm import vsm_params_from_torch  # noqa: E402


def _save_clip(tmpdir, num_layers):
    from transformers import CLIPImageProcessor, CLIPVisionConfig, \
        CLIPVisionModel
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=num_layers,
                           num_attention_heads=4, image_size=224,
                           patch_size=14, projection_dim=32)
    CLIPVisionModel(cfg).save_pretrained(tmpdir)
    CLIPImageProcessor().save_pretrained(tmpdir)


def vqa_manifest(tmpdir):
    lm, _ = load_reference()
    clip_dir = os.path.join(tmpdir, "clip24")
    _save_clip(clip_dir, num_layers=24)     # ViT-L depth
    cfg = lm.LlavaSearchConfig(
        vocab_size=320, hidden_size=64, intermediate_size=128,
        num_hidden_layers=32,               # Vicuna-7B depth
        num_attention_heads=4, num_key_value_heads=4,
        mm_vision_tower=clip_dir, mm_hidden_size=32,
        mm_projector_type="linear", mm_vision_select_layer=-2,
        mm_vision_select_feature="patch")
    model = lm.LlavaSearchLlamaForCausalLM(cfg)
    model.get_model().vision_tower.load_model()
    sd = model.state_dict()

    our = VQALLMConfig(
        llama=LlamaConfig(vocab_size=320, hidden_size=64,
                          intermediate_size=128, num_layers=32, num_heads=4,
                          num_kv_heads=4, head_dim=16),
        vision=ViTConfig(image_size=224, patch_size=14, hidden_size=32,
                         intermediate_size=64, num_layers=24, num_heads=4),
        projector_image=ProjectorConfig(type="linear", in_dim=32,
                                        out_dim=64),
        projector_object=ProjectorConfig(
            type="perceiver", in_dim=32, out_dim=64,
            perceiver=PerceiverConfig(dim=32, depth=6, dim_head=96,
                                      heads=16, num_latents=32)))
    report = audit_import(sd, lambda s: vqa_llm_params_from_torch(s, our))
    assert not report.unknown and not report.missing, report.summary()
    return report


def vsm_manifest(tmpdir):
    _, vsm_mod = load_reference()
    from VisualSearch.model.llava.model.language_model.llava_llama import \
        LlavaConfig
    from transformers import OwlViTConfig
    clip_dir = os.path.join(tmpdir, "clip24b")
    _save_clip(clip_dir, num_layers=24)
    cfg = LlavaConfig(
        vocab_size=320, hidden_size=64, intermediate_size=128,
        num_hidden_layers=32, num_attention_heads=4, num_key_value_heads=4,
        mm_hidden_size=32, mm_vision_select_layer=-2,
        mm_vision_select_feature="patch")
    tiny_owl = OwlViTConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=12,      # OWL-ViT B depth
                           num_attention_heads=4, image_size=768,
                           patch_size=16),
        text_config=dict(hidden_size=24, intermediate_size=48,
                         num_hidden_layers=1, num_attention_heads=2))
    orig = OwlViTConfig.from_pretrained
    OwlViTConfig.from_pretrained = classmethod(lambda c, *a, **k: tiny_owl)
    try:
        model = vsm_mod.VSMForCausalLM(
            cfg, train_mask_decoder=True, out_dim=24, loc_token_idx=3,
            vision_tower=clip_dir)
        model.config.mm_vision_tower = clip_dir
        model.config.vision_tower = clip_dir
        model.get_model().initialize_lisa_modules(model.config,
                                                  is_eval=True)
    finally:
        OwlViTConfig.from_pretrained = orig
    model.get_model().get_vision_tower().load_model()
    sd = model.state_dict()

    our = VSMConfig(
        llama=LlamaConfig(vocab_size=320, hidden_size=64,
                          intermediate_size=128, num_layers=32, num_heads=4,
                          num_kv_heads=4, head_dim=16),
        vision=ViTConfig(image_size=224, patch_size=14, hidden_size=32,
                         intermediate_size=64, num_layers=24, num_heads=4),
        owl_vision=ViTConfig(image_size=768, patch_size=16, hidden_size=32,
                             intermediate_size=64, num_layers=12,
                             num_heads=4, feature_layer=-1),
        owl_head=OwlHeadConfig(vision_dim=32, query_dim=24),
        sam=SamDecoderConfig(),
        projector=ProjectorConfig(type="linear", in_dim=32, out_dim=64),
        out_dim=24, seg_dim=256)
    report = audit_import(sd, lambda s: vsm_params_from_torch(s, our))
    assert not report.unknown and not report.missing, report.summary()
    return report


def write_manifest(name, report):
    path = manifest_path(name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# {name}: checkpoint keys consumed by the importer\n"
                f"# (generated by scripts/gen_key_manifests.py from the\n"
                f"#  reference model definitions at real depths; names are\n"
                f"#  width-independent). Skipped-by-design: "
                f"core/import_audit.DEFAULT_SKIP_PATTERNS\n")
        for k in report.consumed:
            f.write(k + "\n")
    print(f"{name}: {report.summary()} -> {path}")


if __name__ == "__main__":
    import tempfile
    torch.manual_seed(0)
    with tempfile.TemporaryDirectory() as td:
        write_manifest("seal_vqa_7b", vqa_manifest(td))
        write_manifest("seal_vsm_7b", vsm_manifest(td))
