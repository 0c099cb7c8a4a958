"""Batched VSM search-step throughput on real TPU: steps/sec vs batch size.

Measures the lockstep wave cost at B in {1, 4, 8}: since decode is weight-
bandwidth-bound, larger B amortizes the 7B weight reads across searches."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import init_vsm_params, vsm_generate
from vstar_tpu.multimodal.constants import IMAGE_TOKEN_INDEX
from vstar_tpu.multimodal.splicing import build_layout

MAX_NEW = 16
cfg = vsm_7b()
params = init_vsm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                         quantize_llm=True)
rng = np.random.RandomState(0)

run = jax.jit(vsm_generate,
              static_argnames=("cfg", "loc_token_id", "max_new_tokens",
                               "eos_id", "cache_len", "compute_dtype",
                               "spec_chunk"))
checksum = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

ids = [1, IMAGE_TOKEN_INDEX] + list(rng.randint(10, 30000, size=58))
bucket = 384
lay = build_layout(ids, bucket, n_long=cfg.image_tokens, n_short=0,
                   image_long=True)

for B in (1, 4, 8):
    clip = jnp.asarray(rng.randn(B, 224, 224, 3), jnp.float32)
    owl = jnp.asarray(rng.randn(B, 768, 768, 3), jnp.float32)
    text = jnp.asarray(np.stack([lay.text_ids] * B))
    fi = jnp.asarray(np.stack([lay.feat_idx] * B))
    isf = jnp.asarray(np.stack([lay.is_feat] * B))
    lens = jnp.asarray([lay.length] * B, jnp.int32)

    def step(seed, draft=None):
        out = run(params, cfg, clip + jnp.float32(seed) * 1e-3, owl, text,
                  fi, isf, lens, loc_token_id=32000, max_new_tokens=MAX_NEW,
                  eos_id=2, cache_len=bucket + 128,
                  compute_dtype=jnp.bfloat16, draft_ids=draft, spec_chunk=8)
        return float(np.asarray(checksum(out.det_logits))), out

    _, out_g = step(0)
    toks = np.asarray(out_g.tokens)
    draft_np = np.full((B, MAX_NEW + 8), 2, np.int32)
    draft_np[:, :MAX_NEW - 1] = toks[:, 1:MAX_NEW]
    draft = jnp.asarray(draft_np)
    step(0, draft)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        step(i + 1, draft)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"B={B}: {t * 1000:7.1f} ms/wave  -> {B / t:6.2f} search-steps/s "
          f"({B / t / 3:.2f} full searches/s est.)", flush=True)
