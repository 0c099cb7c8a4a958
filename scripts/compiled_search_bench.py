"""Compiled (whole-search-one-dispatch) vs host-policy guided search at
7B on a 2K image — the BASELINE.json north-star A/B.

Both sides run the SAME device work (canvas-resident window extraction,
towers, prefill, speculative decode, heads); the compiled side also keeps
the queue/threshold/split/scoring policy on device inside one
lax.while_loop, so an N-step target-cue search costs ONE dispatch instead
of N round-trips (each 5-15 ms dispatch + heatmap fetch + host scoring
through the relay).

The target-cue regime is forced (thresholds < 0 => every step expands on
its own heatmap; confidence_high=2 => no accept) so both sides measure
exactly N detect steps. Random weights never accept anyway; real
checkpoints take this regime's path with early accepts.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compiled_search_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine, run_batched_searches
from vstar_tpu.search.compiled import CompiledVSMSearch

import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_common import Tok

STEPS = 4
FORCED = dict(smallest_size=512, confidence_high=2.0,
              target_cue_threshold=-1.0, target_cue_threshold_decay=0.7,
              target_cue_threshold_minimum=-1.0, max_steps=STEPS)


def main():
    print("devices:", jax.devices())
    cfg = vsm_7b()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.bfloat16, quantize_llm=True)
    eng = BatchedVSMEngine(params, cfg, Tok(), loc_token_id=3,
                           max_new_tokens=24, prompt_buckets=(384,),
                           device_preprocess=True)
    comp = CompiledVSMSearch(eng, P=16)
    img = Image.fromarray((np.random.RandomState(0)
                           .rand(1536, 2048, 3) * 255).astype("uint8"))
    eng._canvas(img)  # canvas uploaded once, outside both timed regions

    for label, run in (
            ("host-policy", lambda: run_batched_searches(
                eng, [img], ["red mug"], **FORCED)),
            ("compiled", lambda: comp.search(img, "red mug", **FORCED))):
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{label:12s}: reps {[f'{t:.2f}' for t in times]} s; "
              f"steady {dt:.3f} s for {STEPS} steps -> "
              f"{dt / STEPS * 1e3:6.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
