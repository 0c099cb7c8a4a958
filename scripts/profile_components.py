"""Per-component timing of the VSM pipeline on the real chip.

Relay-aware timing: chain K repetitions inside one jitted call and fetch a
scalar (block_until_ready is unreliable through the axon relay)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import (encode_clip_bank, init_vsm_params,
                                  owl_features, vsm_detection,
                                  vsm_segmentation)
from vstar_tpu.nn.llama import (embed_tokens, init_cache, llama_forward,
                                lm_logits)

K = 8  # repetitions chained per measurement

cfg = vsm_7b()
params = init_vsm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                         quantize_llm=True)
rng = np.random.RandomState(0)

img_clip = jnp.asarray(rng.randn(1, 224, 224, 3), jnp.float32)
img_owl = jnp.asarray(rng.randn(1, 768, 768, 3), jnp.float32)


def timed(name, fn, *args):
    out = fn(params, *args)  # compile
    v = float(np.asarray(out))
    t0 = time.perf_counter()
    v = float(np.asarray(fn(params, *args)))
    dt = time.perf_counter() - t0
    print(f"{name:34s} {dt / K * 1000:8.2f} ms/iter  (chain of {K})",
          flush=True)


def chain(fn, x0):
    def body(i, x):
        return fn(x)
    return jax.lax.fori_loop(0, K, body, x0)


@jax.jit
def clip_bank_t(params, img):
    def one(x):
        return encode_clip_bank(params, cfg, x)[..., :3].mean() * 1e-6 + img
    return jnp.sum(chain(one, img)[0, 0, 0])


@jax.jit
def owl_t(params, img):
    def one(x):
        return owl_features(params, cfg, x)[..., :3].mean() * 1e-6 + img
    return jnp.sum(chain(one, img)[0, 0, 0])


S = 384


@jax.jit
def prefill_t(params, seed):
    ids = jnp.full((1, S), 17, jnp.int32)
    h = embed_tokens(params["llama"], ids, jnp.bfloat16) + seed * 1e-6
    pos = jnp.broadcast_to(jnp.arange(S), (1, S))
    lens = jnp.full((1,), S, jnp.int32)

    def one(x):
        hidden, _ = llama_forward(params["llama"], cfg.llama, x, pos, lens)
        return x + hidden.mean() * 1e-6

    return jnp.sum(chain(one, h)[0, 0, 0])


@jax.jit
def decode_t(params, seed):
    cache = init_cache(cfg.llama, 1, 512, jnp.bfloat16)
    lens0 = jnp.full((1,), 384, jnp.int32)
    cache = cache._replace(length=lens0)
    tok = jnp.full((1, 1), 17, jnp.int32)

    def one(i, carry):
        cache, x = carry
        h = embed_tokens(params["llama"], tok, jnp.bfloat16) + x * 1e-9
        pos = cache.length[:, None]
        hidden, cache = llama_forward(params["llama"], cfg.llama, h, pos,
                                      cache.length + 1,
                                      q_offsets=cache.length, cache=cache)
        logits = lm_logits(params["llama"], hidden)
        return cache, logits.mean().astype(x.dtype)

    cache, x = jax.lax.fori_loop(0, K, one, (cache, seed))
    return x


@jax.jit
def heads_t(params, seed):
    fmap = jnp.zeros((1, 48, 48, 768), jnp.bfloat16) + seed
    loc = jnp.zeros((1, 4096), jnp.bfloat16)

    def one(x):
        lg, bx = vsm_detection(params, cfg, fmap + x * 1e-9, loc)
        m = vsm_segmentation(params, cfg, fmap + x * 1e-9, loc)
        return (x + lg.mean().astype(x.dtype) * 1e-6
                + m.mean().astype(x.dtype) * 1e-6)

    return chain(one, seed)


timed("clip_encode+project (224^2)", clip_bank_t, img_clip)
timed("owl tower (768^2, 2305 tok)", owl_t, img_owl)
timed("llama prefill 384 (int8)", prefill_t, jnp.float32(1.0))
timed("llama decode 1 tok (int8)", decode_t, jnp.float32(1.0))
timed("det+seg heads", heads_t, jnp.bfloat16(1.0))
