"""HF / torch checkpoint import: state_dicts -> framework param pytrees.

The public reference checkpoints (craigwu/seal_vqa_7b, craigwu/seal_vsm_7b;
/root/reference/README.md:32-33) are HF torch checkpoints. These converters
map their flat name->tensor dicts onto this framework's nested, stacked
pytrees. All dense weights are transposed to the JAX (in_dim, out_dim)
layout; LLaMA layers are stacked along a leading axis for lax.scan.

Every function accepts tensors as torch.Tensor or numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig, PerceiverConfig, ViTConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def _lin(sd: Mapping, name: str) -> np.ndarray:
    """torch Linear weight (out,in) -> (in,out)."""
    return _np(sd[name]).T


def strip_prefix(sd: Mapping, prefix: str) -> Dict:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


# ---------------------------------------------------------------------------
# LLaMA
# ---------------------------------------------------------------------------

def llama_params_from_torch(sd: Mapping, cfg: LlamaConfig,
                            dtype=jnp.float32, quantize: bool = False
                            ) -> Dict:
    """Convert an HF LlamaForCausalLM state_dict.

    Handles both bare HF models ('model.layers...') and LLaVA-wrapped ones
    (same keys; vision keys are simply ignored here).

    quantize=True/'int8': the decoder's matmul weights quantize to
    per-channel int8 on the HOST, per layer, so only int8 + scales upload
    — the full bf16 decoder (~13.4 GB at 7B) never sits in HBM.
    quantize='int4': group-128 symmetric int4 (kernels/int4_matmul.py
    serves it on TPU), same host-side discipline, ~3.4 GB at 7B.
    quantize='int4mix': int4/int8 per matrix by the measured kernel
    truth table (nn/quant.INT4MIX_INT4_KEYS) — int8 qkvo + down,
    int4 gate/up + lm_head.
    """
    from ..nn.quant import resolve_matrix_quant

    def stack_lin(fmt, name):
        q = resolve_matrix_quant(quantize, name)
        if q == "int4":
            from ..nn.quant import quantize_weight_int4_np
            qs = [quantize_weight_int4_np(_lin(sd, fmt.format(i)))
                  for i in range(cfg.num_layers)]
            return {"q4": jnp.asarray(np.stack([e["q4"] for e in qs])),
                    "s4": jnp.asarray(np.stack([e["s4"] for e in qs]))}
        if q:
            from ..nn.quant import quantize_weight_np
            qs, ss = [], []
            for i in range(cfg.num_layers):
                e = quantize_weight_np(_lin(sd, fmt.format(i)))
                qs.append(e["q"])
                ss.append(e["s"])
            return {"q": jnp.asarray(np.stack(qs)),
                    "s": jnp.asarray(np.stack(ss))}
        return jnp.asarray(
            np.stack([_lin(sd, fmt.format(i)) for i in range(cfg.num_layers)]),
            dtype)

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([_np(sd[fmt.format(i)]) for i in range(cfg.num_layers)]),
            dtype)

    layers = {
        "input_norm": {"scale": stack_vec(
            "model.layers.{}.input_layernorm.weight")},
        "post_norm": {"scale": stack_vec(
            "model.layers.{}.post_attention_layernorm.weight")},
        "attn": {
            "wq": stack_lin("model.layers.{}.self_attn.q_proj.weight", "wq"),
            "wk": stack_lin("model.layers.{}.self_attn.k_proj.weight", "wk"),
            "wv": stack_lin("model.layers.{}.self_attn.v_proj.weight", "wv"),
            "wo": stack_lin("model.layers.{}.self_attn.o_proj.weight", "wo"),
        },
        "mlp": {
            "w_gate": stack_lin("model.layers.{}.mlp.gate_proj.weight",
                                "w_gate"),
            "w_up": stack_lin("model.layers.{}.mlp.up_proj.weight", "w_up"),
            "w_down": stack_lin("model.layers.{}.mlp.down_proj.weight",
                                "w_down"),
        },
    }
    lm_q = resolve_matrix_quant(quantize, "lm_head")
    if lm_q == "int4":
        from ..nn.quant import quantize_weight_int4_np
        e = quantize_weight_int4_np(_lin(sd, "lm_head.weight"))
        lm_head = {"q4": jnp.asarray(e["q4"]), "s4": jnp.asarray(e["s4"])}
    elif lm_q:
        from ..nn.quant import quantize_weight_np
        e = quantize_weight_np(_lin(sd, "lm_head.weight"))
        lm_head = {"q": jnp.asarray(e["q"]), "s": jnp.asarray(e["s"])}
    else:
        lm_head = jnp.asarray(_lin(sd, "lm_head.weight"), dtype)
    return {
        "embed_tokens": jnp.asarray(_np(sd["model.embed_tokens.weight"]),
                                    dtype),
        "layers": layers,
        "final_norm": {"scale": jnp.asarray(_np(sd["model.norm.weight"]),
                                            dtype)},
        "lm_head": lm_head,
    }


# ---------------------------------------------------------------------------
# CLIP-style ViT (CLIP ViT-L/14 tower and OWL-ViT B/16 tower)
# ---------------------------------------------------------------------------

def vit_params_from_torch(sd: Mapping, cfg: ViTConfig, prefix: str = "",
                          dtype=jnp.float32) -> Dict:
    """Convert an HF CLIPVisionModel / OwlViTVisionModel state_dict.

    `prefix` points at the vision_model root, e.g. 'vision_model.'.
    HF layout: embeddings.{class_embedding,patch_embedding,position_embedding},
    pre_layrnorm (CLIP) / pre_layernorm (OwlViT), encoder.layers.N.
    """
    g = lambda k: sd[prefix + k]  # noqa: E731

    # HF CLIP misspells 'pre_layrnorm'; OwlViT uses 'pre_layernorm'.
    pre_ln_key = None
    for cand in ("pre_layrnorm", "pre_layernorm"):
        if prefix + cand + ".weight" in sd:
            pre_ln_key = cand
            break

    def ln(k):
        return {"scale": jnp.asarray(_np(g(k + ".weight")), dtype),
                "bias": jnp.asarray(_np(g(k + ".bias")), dtype)}

    def lyr(i):
        p = f"encoder.layers.{i}."

        def lw(k):
            return jnp.asarray(_lin(sd, prefix + p + k + ".weight"), dtype)

        def lb(k):
            return jnp.asarray(_np(g(p + k + ".bias")), dtype)

        return {
            "ln1": ln(p + "layer_norm1"),
            "ln2": ln(p + "layer_norm2"),
            "attn": {
                "wq": {"w": lw("self_attn.q_proj"), "b": lb("self_attn.q_proj")},
                "wk": {"w": lw("self_attn.k_proj"), "b": lb("self_attn.k_proj")},
                "wv": {"w": lw("self_attn.v_proj"), "b": lb("self_attn.v_proj")},
                "wo": {"w": lw("self_attn.out_proj"),
                       "b": lb("self_attn.out_proj")},
            },
            "mlp": {
                "fc1": {"w": lw("mlp.fc1"), "b": lb("mlp.fc1")},
                "fc2": {"w": lw("mlp.fc2"), "b": lb("mlp.fc2")},
            },
        }

    import jax
    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[lyr(i) for i in range(cfg.num_layers)])

    # patch embedding conv: torch (out_c, in_c, kh, kw) -> matmul-friendly
    # (kh*kw*in_c, out_c) with HWC ordering to match our patchify.
    pw = _np(g("embeddings.patch_embedding.weight"))
    out_c = pw.shape[0]
    pw = pw.transpose(2, 3, 1, 0).reshape(-1, out_c)

    params = {
        "patch_embed": {"w": jnp.asarray(pw, dtype)},
        "position_embedding": jnp.asarray(
            _np(g("embeddings.position_embedding.weight")), dtype),
        "layers": layers,
        "post_ln": ln("post_layernorm"),
    }
    if cfg.use_class_embedding:
        params["class_embedding"] = jnp.asarray(
            _np(g("embeddings.class_embedding")), dtype)
    if pre_ln_key is not None:
        params["pre_ln"] = ln(pre_ln_key)
    return params


# ---------------------------------------------------------------------------
# Projectors
# ---------------------------------------------------------------------------

def linear_projector_from_torch(sd: Mapping, key: str,
                                dtype=jnp.float32) -> Dict:
    """mm_projector nn.Linear -> dense params."""
    return {"w": jnp.asarray(_lin(sd, key + ".weight"), dtype),
            "b": jnp.asarray(_np(sd[key + ".bias"]), dtype)}


def perceiver_params_from_torch(sd: Mapping, cfg: PerceiverConfig,
                                prefix: str, dtype=jnp.float32) -> Dict:
    """Convert the reference perceiver projector:
    nn.Sequential(LayerNorm, PerceiverResampler, Linear)
    (LLaVA/llava/model/multimodal_projector/builder.py:54-68).

    `prefix` points at the Sequential root, e.g. 'model.mm_projector_object.'
    so keys look like '{prefix}0.weight', '{prefix}1.latents',
    '{prefix}1.layers.0.0.to_q.weight', '{prefix}2.weight'.
    """
    def ln(base):
        return {"scale": jnp.asarray(_np(sd[base + ".weight"]), dtype),
                "bias": jnp.asarray(_np(sd[base + ".bias"]), dtype)}

    import jax

    def layer(i):
        a = f"{prefix}1.layers.{i}.0."   # PerceiverAttention
        f = f"{prefix}1.layers.{i}.1."   # FeedForward Sequential
        return {
            "norm_media": ln(a + "norm_media"),
            "norm_latents": ln(a + "norm_latents"),
            "to_q": {"w": jnp.asarray(_lin(sd, a + "to_q.weight"), dtype)},
            "to_kv": {"w": jnp.asarray(_lin(sd, a + "to_kv.weight"), dtype)},
            "to_out": {"w": jnp.asarray(_lin(sd, a + "to_out.weight"), dtype)},
            "ff_norm": ln(f + "0"),
            "ff_in": {"w": jnp.asarray(_lin(sd, f + "1.weight"), dtype)},
            "ff_out": {"w": jnp.asarray(_lin(sd, f + "3.weight"), dtype)},
        }

    layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[layer(i) for i in range(cfg.depth)])

    return {
        "pre_ln": ln(f"{prefix}0"),
        "latents": jnp.asarray(_np(sd[f"{prefix}1.latents"]), dtype),
        "media_pos_emb": jnp.asarray(_np(sd[f"{prefix}1.media_pos_emb"]),
                                     dtype),
        "layers": layers,
        "final_norm": ln(f"{prefix}1.norm"),
        "out_proj": {"w": jnp.asarray(_lin(sd, f"{prefix}2.weight"), dtype),
                     "b": jnp.asarray(_np(sd[f"{prefix}2.bias"]), dtype)},
    }
