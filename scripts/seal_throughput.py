"""End-to-end batched SEAL phases 1+3 (free-form trigger + option scoring)
at 7B on TPU: images/s without search (search cost measured separately).

--kv-int8: int8 KV cache (per-token/head scales) — halves cache residency
and decode-time KV reads; the r2 measurement put the B=8 knee on exactly
those reads (32 option rows ~ 5.4 GB bf16 KV).

r4 (VERDICT r3 next #5): per-(B, opt-in) device memory stats are captured
after each cell so the B=8 combined-opt-in dip has a measured cause, not a
guess; --reps re-measures each cell to separate relay variance from real
knees. HBM pressure degrades SILENTLY on this chip (no OOM; the same step
measures 0.1 s or 10 s), so bytes_in_use vs bytes_limit is the first
signal to read."""
import argparse
import time
import numpy as np
from PIL import Image
import jax, jax.numpy as jnp
from vstar_tpu.core.config import vqa_llm_7b
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params

from bench_common import Tok  # noqa: E402


def memory_stats():
    """Device HBM stats, or {} when the backend doesn't expose them (the
    axon relay device may not)."""
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        gb = 1024 ** 3
        return {k: round(s[k] / gb, 3)
                for k in ("bytes_in_use", "peak_bytes_in_use",
                          "bytes_limit") if k in s}
    except Exception as e:  # pragma: no cover - backend-dependent
        return {"unavailable": type(e).__name__}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-int8", action="store_true", default=False)
    ap.add_argument("--prompt-lookup", action="store_true", default=False)
    ap.add_argument("--reps", type=int, default=2,
                    help="measured repetitions per B cell (min reported; "
                         "spread separates relay variance from knees)")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8],
                    help="wave sizes to measure (each new size compiles "
                         "a new program shape)")
    args = ap.parse_args()
    cfg = vqa_llm_7b()
    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                                 quantize_llm=True)
    eng = VQAEngine(params, cfg, Tok(), prompt_buckets=(512,),
                    option_bucket=64, kv_int8=args.kv_int8,
                    prompt_lookup=args.prompt_lookup)
    print(f"kv_int8={args.kv_int8} prompt_lookup={args.prompt_lookup}")
    print(f"[mem] after weights: {memory_stats()}", flush=True)

    rng = np.random.RandomState(0)
    n = max(args.batches)
    imgs = [Image.fromarray((rng.rand(500, 600, 3) * 255).astype("uint8"))
            for _ in range(n)]
    qs = [f"is the small object number {i} red or blue ?" for i in range(n)]
    opts = [["red thing", "blue thing", "green", "none"]] * n

    for B in args.batches:
        # warm (compile)
        eng.free_form_many(imgs[:B], qs[:B], max_new_tokens=32)
        eng.multiple_choice_many(imgs[:B], qs[:B], opts[:B])
        times = []
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            eng.free_form_many(imgs[:B], qs[:B], max_new_tokens=32)
            eng.multiple_choice_many(imgs[:B], qs[:B], opts[:B])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"B={B}: phases 1+3 {dt*1000:7.0f} ms -> {B/dt:5.2f} images/s "
              f"(no-search path; reps "
              f"{[f'{t*1000:.0f}' for t in times]} ms)", flush=True)
        print(f"[mem] B={B}: {memory_stats()}", flush=True)


if __name__ == "__main__":
    main()
