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
