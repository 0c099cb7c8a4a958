"""Parity tests for the vision stack against torch oracles.

Oracles: HF transformers (CLIP/OwlViT) and the reference SAM modules
(/root/reference, loaded read-only as a test fixture per SURVEY.md §4).
All models are tiny and randomly initialized; weights flow through the
framework's own importers, so these tests cover both math and import.
"""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vstar_tpu.core.config import (OwlHeadConfig, PerceiverConfig,
                                   SamDecoderConfig, ViTConfig)
from vstar_tpu.core.hf_import import (perceiver_params_from_torch,
                                      vit_params_from_torch)
from vstar_tpu.nn.owl_heads import owl_detect, owl_head_params_from_torch
from vstar_tpu.nn.perceiver import perceiver_resample
from vstar_tpu.nn.sam import (dense_positional_encoding, encode_text_prompt,
                              mask_decoder, sam_params_from_torch)
from vstar_tpu.nn.vit import clip_patch_features, owlvit_feature_map

RTOL = ATOL = 3e-4


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.tensor(x_nhwc.transpose(0, 3, 1, 2))


def test_clip_vit_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu", attn_implementation="eager")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                    intermediate_size=64, num_layers=4, num_heads=4)
    params = vit_params_from_torch(hf.state_dict(), cfg,
                                   prefix="vision_model.")

    rng = np.random.RandomState(0)
    pix = rng.randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(_nchw(pix), output_hidden_states=True)
    # LLaVA 'patch' select: hidden_states[-2] without CLS
    want = hf_out.hidden_states[-2][:, 1:].numpy()

    got = np.asarray(clip_patch_features(params, cfg, jnp.asarray(pix)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_owlvit_feature_map_and_heads_parity():
    from transformers import OwlViTConfig
    from transformers.models.owlvit.modeling_owlvit import (
        OwlViTForObjectDetection)
    hf_cfg = OwlViTConfig.from_text_vision_configs(
        text_config=dict(hidden_size=24, intermediate_size=37,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=16),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=48, patch_size=16,
                           hidden_act="quick_gelu"))
    torch.manual_seed(1)
    hf = OwlViTForObjectDetection(hf_cfg).eval()
    sd = hf.state_dict()

    cfg = ViTConfig(image_size=48, patch_size=16, hidden_size=32,
                    intermediate_size=64, num_layers=3, num_heads=4,
                    feature_layer=-1)
    tower = vit_params_from_torch(sd, cfg, prefix="owlvit.vision_model.")
    from vstar_tpu.core.hf_import import _np
    merge_ln = {"scale": jnp.asarray(_np(sd["layer_norm.weight"])),
                "bias": jnp.asarray(_np(sd["layer_norm.bias"]))}

    rng = np.random.RandomState(1)
    pix = rng.randn(2, 48, 48, 3).astype(np.float32)

    # Oracle: reproduce reference get_visual_embs (owlvit.py:121-148)
    with torch.no_grad():
        vision_out = hf.owlvit.vision_model(_nchw(pix))
        img = hf.owlvit.vision_model.post_layernorm(vision_out[0])
        cls = img[:, :1, :]
        merged = hf.layer_norm(img[:, 1:, :] * cls)
        fmap_want = merged.reshape(2, 3, 3, 32).numpy()

    fmap = owlvit_feature_map(tower, cfg, merge_ln, jnp.asarray(pix))
    np.testing.assert_allclose(np.asarray(fmap), fmap_want,
                               rtol=RTOL, atol=ATOL)

    # Heads: single query (the [LOC]-projected embedding)
    head_cfg = OwlHeadConfig(vision_dim=32, query_dim=24)
    heads = owl_head_params_from_torch(sd)
    q = rng.randn(2, 1, 24).astype(np.float32)
    with torch.no_grad():
        feats_t = merged.reshape(2, 9, 32)
        logits_want, _ = hf.class_predictor(feats_t, torch.tensor(q))
        boxes_want = hf.box_predictor(feats_t, torch.tensor(fmap_want))
    logits, boxes = owl_detect(heads, head_cfg, fmap, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(logits), logits_want.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes), boxes_want.numpy(),
                               rtol=1e-3, atol=1e-3)


def _load_ref_sam():
    """Load the reference SAM modeling files as an isolated package."""
    base = "/root/reference/VisualSearch/model/segment_anything/modeling"
    pkg = types.ModuleType("ref_sam")
    pkg.__path__ = [base]
    sys.modules["ref_sam"] = pkg
    mods = {}
    for name in ["common", "transformer", "prompt_encoder", "mask_decoder"]:
        spec = importlib.util.spec_from_file_location(
            f"ref_sam.{name}", f"{base}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_sam.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def test_sam_prompt_and_mask_decoder_parity():
    mods = _load_ref_sam()
    cfg = SamDecoderConfig(
        embed_dim=32, image_embedding_size=(6, 6), input_image_size=(96, 96),
        transformer_mlp_dim=64, transformer_num_heads=4,
        iou_head_hidden_dim=32)

    torch.manual_seed(2)
    ref_pe = mods["prompt_encoder"].PromptEncoder(
        embed_dim=32, image_embedding_size=(6, 6), input_image_size=(96, 96),
        mask_in_chans=16).eval()
    ref_dec = mods["mask_decoder"].MaskDecoder(
        transformer_dim=32,
        transformer=mods["transformer"].TwoWayTransformer(
            depth=2, embedding_dim=32, mlp_dim=64, num_heads=4),
        num_multimask_outputs=3, iou_head_depth=3,
        iou_head_hidden_dim=32).eval()

    sd = {}
    for k, v in ref_pe.state_dict().items():
        sd["prompt_encoder." + k] = v
    for k, v in ref_dec.state_dict().items():
        sd["mask_decoder." + k] = v
    pe_params, dec_params = sam_params_from_torch(
        sd, cfg, "prompt_encoder.", "mask_decoder.")

    rng = np.random.RandomState(2)
    text = rng.randn(2, 1, 32).astype(np.float32)
    img_emb = rng.randn(2, 6, 6, 32).astype(np.float32)

    with torch.no_grad():
        sparse_t, dense_t = ref_pe(points=None, boxes=None, masks=None,
                                   text_embeds=torch.tensor(text))
        # Reference runs per image with the image embedding broadcast to the
        # prompt batch (VSM.py:322-343); batch=2 here, one prompt each.
        outs = [ref_dec(image_embeddings=_nchw(img_emb[i:i + 1]),
                        image_pe=ref_pe.get_dense_pe(),
                        sparse_prompt_embeddings=sparse_t[i:i + 1],
                        dense_prompt_embeddings=dense_t[i:i + 1],
                        multimask_output=False) for i in range(2)]
        masks_want = torch.cat([o[0] for o in outs])
        iou_want = torch.cat([o[1] for o in outs])

    sparse, dense = encode_text_prompt(pe_params, cfg, jnp.asarray(text))
    np.testing.assert_allclose(
        np.asarray(dense).transpose(0, 3, 1, 2), dense_t.detach().numpy(),
        rtol=RTOL, atol=ATOL)
    pe_grid = dense_positional_encoding(pe_params, cfg)
    np.testing.assert_allclose(
        np.asarray(pe_grid).transpose(2, 0, 1),
        ref_pe.get_dense_pe()[0].numpy(), rtol=RTOL, atol=ATOL)

    masks, iou = mask_decoder(dec_params, cfg, jnp.asarray(img_emb), pe_grid,
                              sparse, dense, multimask_output=False)
    np.testing.assert_allclose(np.asarray(masks), masks_want.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(iou), iou_want.numpy(),
                               rtol=2e-3, atol=2e-3)


class _TorchPerceiver(torch.nn.Module):
    """Torch oracle mirroring the reference projector structure
    (builder.py:54-68 + perceiver.py) so state_dict keys line up."""

    def __init__(self, dim, depth, dim_head, heads, num_latents, out_dim):
        super().__init__()
        inner = dim_head * heads

        def attn():
            m = torch.nn.Module()
            m.norm_media = torch.nn.LayerNorm(dim)
            m.norm_latents = torch.nn.LayerNorm(dim)
            m.to_q = torch.nn.Linear(dim, inner, bias=False)
            m.to_kv = torch.nn.Linear(dim, inner * 2, bias=False)
            m.to_out = torch.nn.Linear(inner, dim, bias=False)
            return m

        def ff():
            return torch.nn.Sequential(
                torch.nn.LayerNorm(dim),
                torch.nn.Linear(dim, dim * 4, bias=False),
                torch.nn.GELU(),
                torch.nn.Linear(dim * 4, dim, bias=False))

        resampler = torch.nn.Module()
        resampler.latents = torch.nn.Parameter(torch.randn(num_latents, dim))
        resampler.media_pos_emb = torch.nn.Parameter(torch.randn(1, 1, dim))
        resampler.layers = torch.nn.ModuleList(
            [torch.nn.ModuleList([attn(), ff()]) for _ in range(depth)])
        resampler.norm = torch.nn.LayerNorm(dim)

        self.seq = torch.nn.ModuleDict({
            "0": torch.nn.LayerNorm(dim),
            "1": resampler,
            "2": torch.nn.Linear(dim, out_dim),
        })
        self.dim_head, self.heads = dim_head, heads

    def forward(self, x):
        x = self.seq["0"](x)
        r = self.seq["1"]
        x = x + r.media_pos_emb[0]
        lat = r.latents.unsqueeze(0).expand(x.shape[0], -1, -1)
        for a, f in r.layers:
            xm = a.norm_media(x)
            lm = a.norm_latents(lat)
            q = a.to_q(lm)
            kv = a.to_kv(torch.cat([xm, lm], dim=1))
            k, v = kv.chunk(2, dim=-1)
            B, L, _ = q.shape
            N = k.shape[1]
            q = q.view(B, L, self.heads, self.dim_head).transpose(1, 2)
            k = k.view(B, N, self.heads, self.dim_head).transpose(1, 2)
            v = v.view(B, N, self.heads, self.dim_head).transpose(1, 2)
            sim = (q * self.dim_head ** -0.5) @ k.transpose(-1, -2)
            sim = sim - sim.amax(dim=-1, keepdim=True).detach()
            attn_w = sim.softmax(dim=-1)
            o = (attn_w @ v).transpose(1, 2).reshape(B, L, -1)
            lat = lat + a.to_out(o)
            lat = lat + f(lat)
        lat = r.norm(lat)
        return self.seq["2"](lat)


def test_perceiver_parity():
    dim, depth, dim_head, heads, n_lat, out = 32, 2, 8, 2, 4, 64
    torch.manual_seed(3)
    oracle = _TorchPerceiver(dim, depth, dim_head, heads, n_lat, out).eval()

    # Rename 'seq.N.' -> 'N.' to mimic reference Sequential keys.
    sd = {k.replace("seq.", ""): v for k, v in oracle.state_dict().items()}
    cfg = PerceiverConfig(dim=dim, depth=depth, dim_head=dim_head,
                          heads=heads, num_latents=n_lat)
    params = perceiver_params_from_torch(sd, cfg, prefix="")

    rng = np.random.RandomState(3)
    media = rng.randn(2, 6, dim).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(media)).numpy()
    got = np.asarray(perceiver_resample(params, cfg, jnp.asarray(media)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_tower_attention_kernel_parity():
    """Pallas tower kernel (interpret mode) == fused-XLA einsum attention,
    including the S % block_q != 0 key-masking path (257 -> pad 304)."""
    import jax.numpy as jnp

    from vstar_tpu.kernels.tower_attention import tower_attention

    rng = np.random.RandomState(7)
    B, S, H, D = 2, 257, 4, 64
    q, k, v = (jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
               .astype(jnp.bfloat16) for _ in range(3))
    ref = tower_attention(q, k, v)                  # einsum fallback on CPU
    ker = tower_attention(q, k, v, interpret=True)  # pallas interpret mode
    err = float(jnp.abs(ref.astype(jnp.float32)
                        - ker.astype(jnp.float32)).max())
    assert err < 2e-2, err


def test_tower_attention_grad_parity():
    """custom_vjp backward == autodiff through plain einsum attention."""
    import jax
    import jax.numpy as jnp

    from vstar_tpu.kernels.tower_attention import tower_attention

    rng = np.random.RandomState(3)
    B, S, H, D = 1, 64, 2, 16
    q, k, v, w = (jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
                  for _ in range(4))

    def ref(q, k, v):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * D ** -0.5, k)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * w), argnums=(0, 1, 2))(
        q, k, v)
    g_ker = jax.grad(lambda *a: jnp.sum(tower_attention(*a) * w),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ker):
        assert float(jnp.abs(a - b).max()) < 1e-4
