"""End-to-end concurrent guided searches on 2K images at 7B: the full
stack (canvas upload, on-device patch extraction, lockstep waves, policy,
detect/vqa/segment modes, heatmap resize) with nothing excluded.

Random weights never accept a detection, so every search runs to
max_steps with the context-cue fallback — the WORST-case per-step cost
(up to 3 VSM calls/step); real checkpoints accept early and hit the
target cue. Reported as searches/sec at the capped path length.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/batched_2k_search_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine, run_batched_searches

import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_common import Tok

MAX_STEPS = 3


def main():
    print("devices:", jax.devices())
    cfg = vsm_7b()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.bfloat16, quantize_llm=True)
    eng = BatchedVSMEngine(params, cfg, Tok(), loc_token_id=3,
                           max_new_tokens=24, prompt_buckets=(384,),
                           device_preprocess=True)
    rng = np.random.RandomState(0)

    def images(n, seed):
        r = np.random.RandomState(seed)
        return [Image.fromarray((r.rand(1536, 2048, 3) * 255
                                 ).astype("uint8")) for _ in range(n)]

    names = ["red mug", "clock", "license plate", "street sign",
             "blue bicycle", "stop sign", "black cat", "umbrella"]
    for B in (1, 4, 8):
        # report the BEST rep: random content steers different searches
        # into not-yet-compiled kind/bucket programs, so early reps can
        # absorb 20-40 s remote compiles; the min is the steady state a
        # deployment reaches once every wave shape has compiled.
        times = []
        for rep in range(4):
            imgs = images(B, rep)       # built outside the timed region
            t0 = time.perf_counter()
            run_batched_searches(eng, imgs, names[:B],
                                 smallest_size=512, max_steps=MAX_STEPS)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"B={B}: reps {[f'{t:.1f}' for t in times]} s; steady "
              f"{dt:6.2f} s -> {B / dt:5.2f} searches/s "
              f"(2K images, {MAX_STEPS}-step cap, worst-case cue path)",
              flush=True)


if __name__ == "__main__":
    main()
