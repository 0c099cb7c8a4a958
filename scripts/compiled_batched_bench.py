"""Batched fused searches vs host lockstep waves at 7B on 2K images.

Both sides run B=4 concurrent guided searches in the forced target-cue
regime (3 steps each, no context cue). The host side batches per-wave VSM
calls but round-trips the policy every step; the fused side runs all four
whole searches inside one device program (fused_search_batched).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compiled_batched_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine, run_grouped_searches
from vstar_tpu.search.compiled import CompiledVSMSearch

import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_common import Tok

STEPS = 3
FORCED = dict(confidence_high=2.0, target_cue_threshold=-1.0,
              target_cue_threshold_decay=0.7,
              target_cue_threshold_minimum=-1.0)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache in every engine/fused program")
    ap.add_argument("--max-b", type=int, default=4,
                    help="largest fused batch bucket to measure "
                         "(4, 8 or 16)")
    ap.add_argument("--skip-host", action="store_true",
                    help="skip the host-waves baseline row")
    ap.add_argument("--w8a8", action="store_true",
                    help="per-token dynamic int8 activations on the MXU "
                         "(opt-in, like bench.py --w8a8)")
    ap.add_argument("--force-ctx", action="store_true",
                    help="every step takes the context-cue path "
                         "(unreachably high cue thresholds): the "
                         "worst-path regime. r3 served each event with "
                         "3+ separate host waves; r4 decodes the answer "
                         "and segments in-program (one dispatch + one "
                         "fetch per event)")
    args = ap.parse_args()
    if args.w8a8:
        from vstar_tpu.nn.quant import set_act_int8
        set_act_int8(True)

    print("devices:", jax.devices())
    cfg = vsm_7b()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.bfloat16, quantize_llm=True)
    eng = BatchedVSMEngine(params, cfg, Tok(), loc_token_id=3,
                           max_new_tokens=16, prompt_buckets=(384,),
                           device_preprocess=True, kv_int8=args.kv_int8)
    buckets = tuple(b for b in (1, 2, 4, 8, 16) if b <= args.max_b)
    comp = CompiledVSMSearch(eng, P=8, batch_buckets=buckets)
    rng = np.random.RandomState(0)
    imgs = [Image.fromarray(rng.randint(0, 255, (1536, 2048, 3),
                                        dtype=np.uint8))
            for _ in range(args.max_b)]
    names = ["red mug", "clock", "street sign", "umbrella",
             "bicycle", "stop light", "backpack", "fire hydrant",
             "coffee cup", "laptop", "pigeon", "mailbox",
             "traffic cone", "ladder", "shopping cart", "bench"]
    for im in imgs:
        eng._canvas(im)   # uploads outside both timed regions

    forced = dict(FORCED)
    if args.force_ctx:
        # heat max can never exceed 1e9: every non-small step exits to
        # the context cue (the reference's visual_search.py:428-443 path)
        forced["target_cue_threshold"] = 1e9
        forced["target_cue_threshold_minimum"] = 1e9

    def tasks(k):
        return [{"image": imgs[i], "name": names[i], "smallest": 512}
                for i in range(k)]

    rows = [("host-waves  B=4", eng, 4),
            ("fused       B=1", comp, 1),
            ("fused-batch B=4", comp, 4)]
    if args.skip_host:
        rows = rows[1:]
    if args.max_b >= 8:
        rows.append(("fused-batch B=8", comp, 8))
    if args.max_b >= 16:
        rows.append(("fused-batch B=16", comp, 16))
    for label, engine, B in rows:
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            run_grouped_searches(engine, tasks(B), image_batch=B,
                                 max_steps=STEPS, **forced)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{label}: reps {[f'{t:.2f}' for t in ts]} s; steady "
              f"{dt:.3f} s -> {B / dt:5.2f} searches/s "
              f"({B * STEPS / dt:5.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
