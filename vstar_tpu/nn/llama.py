"""LLaMA decoder (Vicuna-7B shape), TPU-native.

Design (vs the reference's HF LlamaForCausalLM):
  * layer parameters are stacked along a leading layer axis and the stack is
    traversed with `lax.scan` — one compiled layer body instead of 32
    unrolled layers (fast compiles, natural for pjit sharding);
  * a ragged KV cache (right-padded, per-row lengths) with chunked insert
    supports prefill, cached decode, and prefix-cache option scoring — the
    reference's VSM disables the cache entirely and recomputes the full
    sequence every decode step (VisualSearch/model/VSM.py:151), which this
    design fixes;
  * attention runs on the Pallas flash kernel for chunks and a fused jnp
    path for single-token decode.

Weight layout: dense weights are (in_dim, out_dim) — transposed from torch.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from ..core.params import KeyGen, dense_init, embed_init
from ..kernels.flash_attention import flash_attention
from .basic import init_rmsnorm, rmsnorm
from .quant import qdot
from .rope import apply_rope, rope_angles


class KVCache(NamedTuple):
    """Ragged per-row KV cache. k/v: [L, B, S_max, H_kv, Dh]; length: [B].

    int8 mode (k/v int8 + per-(token, head) f32 scales): halves cache
    residency AND the per-decode-step HBM reads — decode is KV-bandwidth
    bound once B x S grows (BASELINE.md r2: B=8 SEAL slower than B=4
    because 32 option rows of bf16 KV ~ 5.4 GB rivals the weight reads).
    Dequantization happens inside the attention reads (the single-token
    decode path is fused jnp, so XLA reads int8 from HBM and scales in
    registers)."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # int32 [B], valid prefix per row
    k_scale: Optional[jnp.ndarray] = None  # [L, B, S_max, H_kv] f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, kv_int8: bool = False) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if kv_int8:
        sshape = shape[:-1]
        return KVCache(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       length=jnp.zeros((batch,), jnp.int32),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((batch,), jnp.int32))


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S, H, D] -> (int8 [B,S,H,D], f32 scale [B,S,H]) per token+head
    (absmax / 127)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-10)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_llama_params(key, cfg: LlamaConfig, dtype=jnp.float32,
                      quantize=False) -> Dict:
    """quantize: False | True/'int8' | 'int4' | 'int4mix' — builds
    quantized decoder weights tensor-by-tensor so the full bf16 model
    never has to fit in memory (16 GB v5e serving). 'int4mix' picks
    int4/int8 per matrix from the measured kernel truth table
    (quant.INT4MIX_INT4_KEYS)."""
    kg = KeyGen(key)
    D, L = cfg.hidden_size, cfg.num_layers

    def stack(fn, name):
        from .quant import resolve_matrix_quant
        q = resolve_matrix_quant(quantize, name)
        if not q:
            return jnp.stack([fn(kg()) for _ in range(L)])
        if q == "int4":
            from .quant import quantize_weight_int4
            qs = [quantize_weight_int4(fn(kg())) for _ in range(L)]
            return {"q4": jnp.stack([e["q4"] for e in qs]),
                    "s4": jnp.stack([e["s4"] for e in qs])}
        from .quant import quantize_weight
        qs = [quantize_weight(fn(kg())) for _ in range(L)]
        return {"q": jnp.stack([e["q"] for e in qs]),
                "s": jnp.stack([e["s"] for e in qs])}

    layers = {
        "input_norm": {"scale": jnp.ones((L, D), dtype)},
        "post_norm": {"scale": jnp.ones((L, D), dtype)},
        "attn": {
            "wq": stack(lambda k: dense_init(k, D, cfg.q_dim, dtype=dtype),
                        "wq"),
            "wk": stack(lambda k: dense_init(k, D, cfg.kv_dim, dtype=dtype),
                        "wk"),
            "wv": stack(lambda k: dense_init(k, D, cfg.kv_dim, dtype=dtype),
                        "wv"),
            "wo": stack(lambda k: dense_init(k, cfg.q_dim, D, dtype=dtype),
                        "wo"),
        },
        "mlp": {
            "w_gate": stack(lambda k: dense_init(k, D, cfg.intermediate_size,
                                                 dtype=dtype), "w_gate"),
            "w_up": stack(lambda k: dense_init(k, D, cfg.intermediate_size,
                                               dtype=dtype), "w_up"),
            "w_down": stack(lambda k: dense_init(k, cfg.intermediate_size, D,
                                                 dtype=dtype), "w_down"),
        },
    }
    from .quant import resolve_matrix_quant
    lm_head = dense_init(kg(), D, cfg.vocab_size, dtype=dtype)
    lm_q = resolve_matrix_quant(quantize, "lm_head")
    if lm_q == "int4":
        # vocab dim not group-divisible constraints don't apply (grouping is
        # along IN=hidden); int4 lm_head is fine.
        from .quant import quantize_weight_int4
        lm_head = quantize_weight_int4(lm_head)
    elif lm_q:
        from .quant import quantize_weight
        lm_head = quantize_weight(lm_head)
    return {
        "embed_tokens": embed_init(kg(), cfg.vocab_size, D, dtype=dtype),
        "layers": layers,
        "final_norm": init_rmsnorm(D, dtype),
        "lm_head": lm_head,
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ragged_insert(cache_kv: jnp.ndarray, new_kv: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """Insert new_kv [B,S,...] into cache_kv [B,Smax,...] at per-row
    offsets (rank-agnostic: scales [B,S,H] insert the same way)."""
    def one(c, x, o):
        starts = (o,) + (0,) * (c.ndim - 1)
        return jax.lax.dynamic_update_slice(c, x.astype(c.dtype), starts)
    return jax.vmap(one)(cache_kv, new_kv, offsets)


def _attention_block(lp: Dict, cfg: LlamaConfig, x: jnp.ndarray,
                     cos: jnp.ndarray, sin: jnp.ndarray,
                     kv_lens: jnp.ndarray, q_offsets: Optional[jnp.ndarray],
                     cache_k: Optional[jnp.ndarray],
                     cache_v: Optional[jnp.ndarray],
                     use_pallas: Optional[bool],
                     kv_valid: Optional[jnp.ndarray] = None,
                     cache_ks: Optional[jnp.ndarray] = None,
                     cache_vs: Optional[jnp.ndarray] = None):
    B, S, D = x.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = qdot(x, lp["wq"])
    k = qdot(x, lp["wk"]).reshape(B, S, Hkv, Dh)
    v = qdot(x, lp["wv"])
    if "lora" in lp:
        from ..train.lora import lora_delta
        q = q + lora_delta(lp["lora"], lp["lora_scale"], "wq", x)
        v = v + lora_delta(lp["lora"], lp["lora_scale"], "wv", x)
    q = q.reshape(B, S, H, Dh)
    v = v.reshape(B, S, Hkv, Dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_k is not None:
        offs = q_offsets if q_offsets is not None else jnp.zeros((B,), jnp.int32)
        if cache_ks is not None:        # int8 KV cache
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            cache_k = _ragged_insert(cache_k, kq, offs)
            cache_v = _ragged_insert(cache_v, vq, offs)
            cache_ks = _ragged_insert(cache_ks, ks, offs)
            cache_vs = _ragged_insert(cache_vs, vs, offs)
            # dequant on read; on the single-token decode path XLA fuses
            # this into the attention contraction (int8 HBM reads)
            k_all = (cache_k.astype(jnp.float32)
                     * cache_ks[..., None]).astype(k.dtype)
            v_all = (cache_v.astype(jnp.float32)
                     * cache_vs[..., None]).astype(v.dtype)
        else:
            cache_k = _ragged_insert(cache_k, k, offs)
            cache_v = _ragged_insert(cache_v, v, offs)
            k_all, v_all = cache_k, cache_v
    else:
        k_all, v_all = k, v

    if Hkv != H:
        rep = H // Hkv
        k_all = jnp.repeat(k_all, rep, axis=2)
        v_all = jnp.repeat(v_all, rep, axis=2)

    out = flash_attention(q, k_all, v_all, kv_lens=kv_lens,
                          q_offsets=q_offsets, causal=True,
                          use_pallas=use_pallas, kv_valid=kv_valid)
    out = out.reshape(B, S, H * Dh)
    return qdot(out, lp["wo"]), cache_k, cache_v, cache_ks, cache_vs


def _mlp_block(lp: Dict, x: jnp.ndarray) -> jnp.ndarray:
    gate = jax.nn.silu(qdot(x, lp["w_gate"]))
    up = qdot(x, lp["w_up"])
    return qdot(gate * up, lp["w_down"])


def llama_forward(params: Dict, cfg: LlamaConfig, hidden: jnp.ndarray,
                  positions: jnp.ndarray, kv_lens: jnp.ndarray,
                  q_offsets: Optional[jnp.ndarray] = None,
                  cache: Optional[KVCache] = None,
                  use_pallas: Optional[bool] = None,
                  remat: bool = False,
                  kv_valid: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack over input embeddings.

    hidden:    [B, S, D] input embeddings (token or spliced multimodal)
    positions: [B, S] int32 RoPE positions
    kv_lens:   [B] total valid kv after this chunk (cache_len + chunk_len)
    q_offsets: [B] kv-coordinate of the chunk start (None = 0, plain prefill)
    cache:     optional KVCache; when given, k/v are inserted at q_offsets
               and attention runs over the whole cache.

    Returns (hidden [B,S,D] after final norm, updated cache or None).
    """
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
    cos = cos[:, :, None, :]  # [B,S,1,Dh] broadcast over heads
    sin = sin[:, :, None, :]

    kv_int8 = cache is not None and cache.k_scale is not None

    def layer(carry, xs):
        x = carry
        ck = cv = cks = cvs = None
        if cache is not None:
            if kv_int8:
                lp, ck, cv, cks, cvs = xs
            else:
                lp, ck, cv = xs
        else:
            lp = xs
        h = rmsnorm(lp["input_norm"], x, cfg.rms_norm_eps)
        attn_out, new_ck, new_cv, new_cks, new_cvs = _attention_block(
            lp["attn"], cfg, h, cos, sin, kv_lens, q_offsets, ck, cv,
            use_pallas, kv_valid, cks, cvs)
        x = x + attn_out
        h = rmsnorm(lp["post_norm"], x, cfg.rms_norm_eps)
        x = x + _mlp_block(lp["mlp"], h)
        if kv_int8:
            return x, (new_ck, new_cv, new_cks, new_cvs)
        return x, (new_ck, new_cv)

    if remat:
        layer = jax.checkpoint(layer)

    if cache is None:
        xs = params["layers"]
    elif kv_int8:
        xs = (params["layers"], cache.k, cache.v, cache.k_scale,
              cache.v_scale)
    else:
        xs = (params["layers"], cache.k, cache.v)
    hidden, new_kv = jax.lax.scan(layer, hidden, xs)

    new_cache = None
    if cache is not None:
        # length grows by each row's number of valid new tokens =
        # kv_lens - old q_offsets; caller passes exact values.
        if kv_int8:
            new_cache = KVCache(k=new_kv[0], v=new_kv[1], length=kv_lens,
                                k_scale=new_kv[2], v_scale=new_kv[3])
        else:
            new_cache = KVCache(k=new_kv[0], v=new_kv[1], length=kv_lens)
    hidden = rmsnorm(params["final_norm"], hidden, cfg.rms_norm_eps)
    return hidden, new_cache


def lm_logits(params: Dict, hidden: jnp.ndarray,
              dtype=jnp.float32) -> jnp.ndarray:
    """Project final hidden states to vocab logits (f32 for stable CE)."""
    return qdot(hidden, params["lm_head"]).astype(dtype)


def embed_tokens(params: Dict, ids: jnp.ndarray,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Token id -> embedding lookup; negative ids (sentinels) map to row 0
    (their embeddings are replaced by vision features during splicing)."""
    safe = jnp.where(ids < 0, 0, ids)
    return jnp.take(params["embed_tokens"], safe, axis=0).astype(dtype)
