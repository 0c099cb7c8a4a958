"""LoRA adapters for the LLaMA decoder.

The reference trains the VSM with peft LoRA r=8 alpha=16 on q_proj/v_proj
(VisualSearch/train.py:189-231) and merges before export
(merge_lora_weights_and_save_hf_model.py). Here adapters live in
`params['layers']['attn']['lora']` as stacked tensors and are applied
inside the attention block; `merge_lora` folds them into the base weights.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.params import KeyGen, map_with_path


LORA_TARGETS = ("wq", "wv")  # q_proj, v_proj


def add_lora(llama_params: Dict, key, r: int = 8, alpha: int = 16,
             targets: Sequence[str] = LORA_TARGETS) -> Dict:
    """Return params with zero-impact LoRA adapters attached (A ~ N(0,1/r),
    B = 0, matching peft init)."""
    kg = KeyGen(key)
    attn = llama_params["layers"]["attn"]
    lora = {}
    for t in targets:
        w = attn[t]
        base = w["q"] if isinstance(w, dict) and "q" in w else w
        L, din, dout = base.shape
        lora[f"{t}_a"] = (jax.random.normal(kg(), (L, din, r))
                          * (1.0 / r)).astype(jnp.float32)
        lora[f"{t}_b"] = jnp.zeros((L, r, dout), jnp.float32)
    out = dict(llama_params)
    layers = dict(llama_params["layers"])
    layers["attn"] = dict(attn)
    layers["attn"]["lora"] = lora
    layers["attn"]["lora_scale"] = jnp.full((L, 1, 1), alpha / r, jnp.float32)
    out["layers"] = layers
    return out


def lora_delta(lora: Dict, scale: jnp.ndarray, name: str,
               x: jnp.ndarray) -> jnp.ndarray:
    """x @ (A B) * alpha/r for one target (per-layer slice inside scan)."""
    a = lora[f"{name}_a"].astype(x.dtype)
    b = lora[f"{name}_b"].astype(x.dtype)
    return ((x @ a) @ b) * scale.astype(x.dtype)


def merge_lora(llama_params: Dict,
               targets: Sequence[str] = LORA_TARGETS) -> Dict:
    """Fold adapters into the base weights and drop them (export path,
    mirroring merge_and_unload)."""
    from ..nn.quant import dequantize_weight
    attn = dict(llama_params["layers"]["attn"])
    lora = attn.pop("lora")
    scale = attn.pop("lora_scale")
    for t in targets:
        orig = attn[t]
        base = dequantize_weight(orig, jnp.float32)
        delta = jnp.einsum("lir,lro->lio", lora[f"{t}_a"],
                           lora[f"{t}_b"]) * scale
        out_dtype = jnp.float32 if isinstance(orig, dict) else orig.dtype
        attn[t] = (base + delta).astype(out_dtype)
    out = dict(llama_params)
    layers = dict(llama_params["layers"])
    layers["attn"] = attn
    out["layers"] = layers
    return out


def vsm_trainable_mask(params: Dict) -> Dict:
    """The reference's trainable set (VisualSearch/train.py:236-245):
    LoRA adapters, lm_head, embed_tokens, visual_projection, prompt_encoder,
    mask_decoder, text FCs, owl class_head + merge layer_norm. Everything
    else (towers, box_head, projector, base decoder weights) frozen."""
    def trainable(path: str, _) -> bool:
        if path.startswith("llama.layers.attn.lora"):
            return True
        if path.startswith(("llama.lm_head", "llama.embed_tokens")):
            return True
        if path.startswith(("visual_projection", "prompt_encoder",
                            "mask_decoder", "fc_det", "fc_seg",
                            "owl_merge_ln")):
            return True
        if path.startswith("owl_heads.class_head"):
            return True
        return False
    return map_with_path(trainable, params)
