"""Export framework pytrees back to HF/torch checkpoint layout.

Counterpart of the reference's merge-and-export script
(VisualSearch/merge_lora_weights_and_save_hf_model.py): merge LoRA, map
the nested/stacked pytrees back to flat torch-style names (transposing
dense weights to (out, in)), and write safetensors shards that
`hf_import.py` — or the original torch reference — can load.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from ..nn.quant import dequantize_weight


def _t(x) -> np.ndarray:
    """(in,out) -> torch (out,in)."""
    return np.asarray(x, np.float32).T


def llama_state_dict(llama_params: Dict, prefix: str = "model."
                     ) -> Dict[str, np.ndarray]:
    """Inverse of hf_import.llama_params_from_torch (merges LoRA first)."""
    p = llama_params
    if "lora" in p["layers"]["attn"]:
        from ..train.lora import merge_lora
        p = merge_lora(p)
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "embed_tokens.weight"] = np.asarray(p["embed_tokens"],
                                                    np.float32)
    sd[prefix + "norm.weight"] = np.asarray(p["final_norm"]["scale"],
                                            np.float32)
    sd["lm_head.weight"] = _t(dequantize_weight(p["lm_head"]))
    L = p["layers"]["input_norm"]["scale"].shape[0]
    names = {
        ("attn", "wq"): "self_attn.q_proj", ("attn", "wk"): "self_attn.k_proj",
        ("attn", "wv"): "self_attn.v_proj", ("attn", "wo"): "self_attn.o_proj",
        ("mlp", "w_gate"): "mlp.gate_proj", ("mlp", "w_up"): "mlp.up_proj",
        ("mlp", "w_down"): "mlp.down_proj",
    }
    for i in range(L):
        base = f"{prefix}layers.{i}."
        sd[base + "input_layernorm.weight"] = np.asarray(
            p["layers"]["input_norm"]["scale"][i], np.float32)
        sd[base + "post_attention_layernorm.weight"] = np.asarray(
            p["layers"]["post_norm"]["scale"][i], np.float32)
        for (grp, key), tname in names.items():
            w = dequantize_weight(
                _index_entry(p["layers"][grp][key], i))
            sd[base + tname + ".weight"] = _t(w)
    return sd


def _index_entry(entry, i):
    if isinstance(entry, dict) and "q" in entry:
        return {"q": entry["q"][i], "s": entry["s"][i]}
    return entry[i]


def vit_state_dict(vit_params: Dict, prefix: str,
                   pre_ln_name: str = "pre_layrnorm"
                   ) -> Dict[str, np.ndarray]:
    """Inverse of hf_import.vit_params_from_torch."""
    p = vit_params
    sd: Dict[str, np.ndarray] = {}

    def ln(name, lnp):
        sd[prefix + name + ".weight"] = np.asarray(lnp["scale"], np.float32)
        sd[prefix + name + ".bias"] = np.asarray(lnp["bias"], np.float32)

    # patch embed: (kh*kw*in, out) -> (out, in, kh, kw)
    w = np.asarray(p["patch_embed"]["w"], np.float32)
    out_c = w.shape[1]
    k = int(round((w.shape[0] / 3) ** 0.5))
    sd[prefix + "embeddings.patch_embedding.weight"] = (
        w.reshape(k, k, 3, out_c).transpose(3, 2, 0, 1))
    sd[prefix + "embeddings.position_embedding.weight"] = np.asarray(
        p["position_embedding"], np.float32)
    if "class_embedding" in p:
        sd[prefix + "embeddings.class_embedding"] = np.asarray(
            p["class_embedding"], np.float32)
    if "pre_ln" in p:
        ln(pre_ln_name, p["pre_ln"])
    ln("post_layernorm", p["post_ln"])

    L = p["layers"]["ln1"]["scale"].shape[0]
    for i in range(L):
        b = f"encoder.layers.{i}."
        for name, sub in (("layer_norm1", p["layers"]["ln1"]),
                          ("layer_norm2", p["layers"]["ln2"])):
            sd[prefix + b + name + ".weight"] = np.asarray(sub["scale"][i],
                                                           np.float32)
            sd[prefix + b + name + ".bias"] = np.asarray(sub["bias"][i],
                                                         np.float32)
        for jn, tn in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"),
                       ("wo", "out_proj")):
            e = p["layers"]["attn"][jn]
            sd[prefix + b + f"self_attn.{tn}.weight"] = _t(e["w"][i])
            sd[prefix + b + f"self_attn.{tn}.bias"] = np.asarray(
                e["b"][i], np.float32)
        for jn in ("fc1", "fc2"):
            e = p["layers"]["mlp"][jn]
            sd[prefix + b + f"mlp.{jn}.weight"] = _t(e["w"][i])
            sd[prefix + b + f"mlp.{jn}.bias"] = np.asarray(e["b"][i],
                                                           np.float32)
    return sd


def save_safetensors(sd: Dict[str, np.ndarray], path: str,
                     shard_bytes: int = 4 * 1024 ** 3):
    """Write a state_dict as (sharded) safetensors + index json."""
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    shards = []
    cur: Dict[str, np.ndarray] = {}
    size = 0
    for k, v in sd.items():
        if size + v.nbytes > shard_bytes and cur:
            shards.append(cur)
            cur, size = {}, 0
        cur[k] = v
        size += v.nbytes
    if cur:
        shards.append(cur)
    index = {"metadata": {}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = (f"model-{i + 1:05d}-of-{n:05d}.safetensors"
                 if n > 1 else "model.safetensors")
        save_file(shard, os.path.join(path, fname))
        for k in shard:
            index["weight_map"][k] = fname
    if n > 1:
        with open(os.path.join(path, "model.safetensors.index.json"),
                  "w") as f:
            json.dump(index, f, indent=2)


def _lin_sd(sd, name, entry):
    sd[name + ".weight"] = _t(entry["w"])
    if "b" in entry:
        sd[name + ".bias"] = np.asarray(entry["b"], np.float32)


def vsm_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Full VSMForCausalLM export — inverse of
    hf_import/models.vsm.vsm_params_from_torch (LoRA merged). Covers the
    decoder, CLIP tower, projector, OWL-ViT tower/heads, SAM prompt
    encoder/mask decoder, and the [LOC] text FCs."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(llama_state_dict(params["llama"]))
    sd.update(vit_state_dict(
        params["vision"],
        prefix="model.vision_tower.vision_tower.vision_model."))
    sd.update(vit_state_dict(params["owl_tower"],
                             prefix="model.owlvit.vision_model.",
                             pre_ln_name="pre_layernorm"))
    _lin_sd(sd, "model.mm_projector", params["proj"]["proj"])
    sd["model.owlvit.layer_norm.weight"] = np.asarray(
        params["owl_merge_ln"]["scale"], np.float32)
    sd["model.owlvit.layer_norm.bias"] = np.asarray(
        params["owl_merge_ln"]["bias"], np.float32)
    for name, key in (("dense0", "dense0"), ("logit_shift", "logit_shift"),
                      ("logit_scale", "logit_scale")):
        _lin_sd(sd, f"model.owlvit.class_head.{name}",
                params["owl_heads"]["class_head"][key])
    for name in ("dense0", "dense1", "dense2"):
        _lin_sd(sd, f"model.owlvit.box_head.{name}",
                params["owl_heads"]["box_head"][name])
    sd["model.visual_projection.weight"] = _t(
        params["visual_projection"]["w"])

    pe = params["prompt_encoder"]
    sd["model.prompt_encoder.pe_layer."
       "positional_encoding_gaussian_matrix"] = np.asarray(
        pe["pe_gaussian"], np.float32)
    sd["model.prompt_encoder.no_mask_embed.weight"] = np.asarray(
        pe["no_mask_embed"], np.float32)[None]

    dec = params["mask_decoder"]
    dp = "model.mask_decoder."
    sd[dp + "iou_token.weight"] = np.asarray(dec["iou_token"], np.float32)
    sd[dp + "mask_tokens.weight"] = np.asarray(dec["mask_tokens"],
                                               np.float32)

    def attn_sd(base, a):
        for jn, tn in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                       ("out", "out_proj")):
            _lin_sd(sd, base + "." + tn, a[jn])

    for i, lp in enumerate(dec["transformer"]["layers"]):
        b = f"{dp}transformer.layers.{i}."
        attn_sd(b + "self_attn", lp["self_attn"])
        attn_sd(b + "cross_attn_token_to_image", lp["cross_t2i"])
        attn_sd(b + "cross_attn_image_to_token", lp["cross_i2t"])
        _lin_sd(sd, b + "mlp.lin1", lp["mlp_in"])
        _lin_sd(sd, b + "mlp.lin2", lp["mlp_out"])
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[b + n + ".weight"] = np.asarray(lp[n]["scale"], np.float32)
            sd[b + n + ".bias"] = np.asarray(lp[n]["bias"], np.float32)
    attn_sd(dp + "transformer.final_attn_token_to_image",
            dec["transformer"]["final_attn"])
    sd[dp + "transformer.norm_final_attn.weight"] = np.asarray(
        dec["transformer"]["norm_final"]["scale"], np.float32)
    sd[dp + "transformer.norm_final_attn.bias"] = np.asarray(
        dec["transformer"]["norm_final"]["bias"], np.float32)

    def conv_sd(name, entry):
        sd[name + ".weight"] = np.asarray(entry["w"],
                                          np.float32).transpose(3, 2, 0, 1)
        sd[name + ".bias"] = np.asarray(entry["b"], np.float32)

    conv_sd(dp + "output_upscaling.0.conv", dec["upscale_conv1"])
    sd[dp + "output_upscaling.1.weight"] = np.asarray(
        dec["upscale_ln"]["scale"], np.float32)
    sd[dp + "output_upscaling.1.bias"] = np.asarray(
        dec["upscale_ln"]["bias"], np.float32)
    conv_sd(dp + "output_upscaling.3.conv", dec["upscale_conv2"])
    for i, mlp in enumerate(dec["hyper_mlps"]):
        for j in range(3):
            _lin_sd(sd, f"{dp}output_hypernetworks_mlps.{i}.layers.{j}",
                    mlp[f"fc{j}"])
    for j in range(3):
        _lin_sd(sd, f"{dp}iou_prediction_head.layers.{j}",
                dec["iou_head"][f"fc{j}"])

    for fc, tname in (("fc_det", "text_hidden_fcs_det"),
                      ("fc_seg", "text_hidden_fcs_seg")):
        _lin_sd(sd, f"model.{tname}.0.0", params[fc]["fc0"])
        _lin_sd(sd, f"model.{tname}.0.2", params[fc]["fc1"])
    return sd
