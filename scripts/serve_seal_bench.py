"""Full-SEAL online serving on ONE chip: the co-resident int4 pair behind
ContinuousSealService, every request running the COMPLETE loop (free-form
trigger -> guided search -> focused multiple-choice).

r2's serving bench (scripts/serve_throughput.py) measured the no-search MC
path only; this one serves the reference demo's whole flow (app.py:130-233
+ the option scorer) with BOTH 7B models resident on one 16 GB chip — the
int4 pair (~9 GB) is what makes single-chip pair serving possible at all
(the int8 pair does not fit, BASELINE.md r2). Phase-swapping weights
per-request would cost ~10 s/request and is not a serving design.

Scenario control (random weights, same regime as bench.py/coresident):
  * missing_parser forces one search per request (random weights never
    emit the reference trigger sentence) — every request pays a search;
  * search_kwargs pin the 3-step target-cue descent (real checkpoints
    additionally accept early, which only shortens the search);
  * each request brings a FRESH 2K noise image (incompressible: the
    canvas upload is paid per request, as in deployment).

Characterizes the latency-throughput tradeoff (VERDICT r4 #5): sweeps the
service's max_batch over {1,2,4,8} at FIXED offered concurrency, reporting
req/s, p50/p90/max latency and time-to-first-result per operating point
(max_batch=1 saturated is the reference's blocking-queue shape). Steady
state: each point is driven once to compile, then measured.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
       scripts/serve_seal_bench.py [--n 16] [--conc 8] [--batches 1 2 4 8]
"""
import argparse
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from vstar_tpu.core.config import vqa_llm_7b, vsm_7b
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine
from vstar_tpu.search.compiled import CompiledVSMSearch
from vstar_tpu.serve.continuous import ContinuousSealService

from bench_common import FORCED_SEARCH as FORCED  # noqa: E402
from bench_common import Tok, sync_params as _sync  # noqa: E402

MAX_NEW_TOKENS = 16
SEARCH_STEPS = 3


class ShortVQA(VQAEngine):
    """32-token free-form budget (the eval CLIs' default trigger budget)."""

    def free_form(self, image, question, **kw):
        kw.setdefault("max_new_tokens", 32)
        return super().free_form(image, question, **kw)

    def free_form_many(self, images, questions, **kw):
        kw.setdefault("max_new_tokens", 32)
        return super().free_form_many(images, questions, **kw)


def drive(service, reqs, conc):
    """Closed-loop load at constant `conc` concurrency: each of `conc`
    workers submits its next request the moment its previous one
    completes (no gated batches — a slow request never stalls unrelated
    submissions). Returns a stats dict + recs.

    Note: when conc == the service's max_batch and requests are
    homogeneous, waves complete in lockstep and this measures the same
    schedule a gated driver would; the closed loop matters when conc and
    max_batch diverge."""
    recs = [None] * len(reqs)
    done_at = [None] * len(reqs)
    it = iter(range(len(reqs)))
    lock = threading.Lock()
    t0 = time.perf_counter()

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            img, q, opts = reqs[i]
            try:
                recs[i] = service.answer(img, q, opts)
            except Exception as e:  # a failed request must not kill the
                recs[i] = e         # sweep's remaining operating points
            done_at[i] = time.perf_counter() - t0

    threads = [threading.Thread(target=worker) for _ in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    ok = [r for r in recs if isinstance(r, dict)]
    failed = len(reqs) - len(ok)
    if failed:
        first = next(r for r in recs if not isinstance(r, dict))
        print(f"  [!] {failed}/{len(reqs)} requests failed "
              f"({type(first).__name__}: {str(first)[:120]})", flush=True)
    if not ok:
        return {"req_per_s": 0.0, "p50_s": float("nan"),
                "p90_s": float("nan"), "max_s": float("nan"),
                "ttfr_s": float("nan"), "n": 0, "failed": failed}, recs
    lats = sorted(r["latency_s"] for r in ok)
    return {
        "req_per_s": len(ok) / wall,
        "p50_s": float(np.percentile(lats, 50)),
        "p90_s": float(np.percentile(lats, 90)),
        "max_s": lats[-1],
        # time-to-first-result: responses are whole records (no token
        # streaming), so the system-level TTFR is the first SUCCESSFUL
        # completion under this offered load — the queue-ramp feel of
        # the mode (a fast failure is not a result)
        "ttfr_s": min(d for d, r in zip(done_at, recs)
                      if d is not None and isinstance(r, dict)),
        "n": len(ok),
        "failed": failed,
    }, recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--conc", type=int, default=8,
                    help="offered concurrency (fixed across the sweep so "
                    "points differ only in the service's wave size)")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8],
                    help="max_batch operating points to characterize")
    ap.add_argument("--window-ms", type=float, default=50.0)
    ap.add_argument("--image-hw", type=int, nargs=2, default=[1536, 2048])
    ap.add_argument("--mixed", action="store_true", default=False,
                    help="mixed-precision co-residency (r5): int8 VQA "
                         "decoder + int8 towers + int4 VSM — the trigger "
                         "decode and MC scoring on every request run at "
                         "int8 speed, only the search pays the int4 "
                         "kernels (scripts/coresident_bench.py --mixed)")
    ap.add_argument("--vsm-quant", choices=["int4", "int4mix"],
                    default="int4",
                    help="VSM decoder precision: 'int4mix' (per-matrix "
                         "int4/int8, nn/quant.INT4MIX_INT4_KEYS) decodes "
                         "searches 1.30x faster but the +1.8 GB pair "
                         "only has headroom for max_batch<=2 waves "
                         "(B>=4 free-form temps overflow 16 GB — "
                         "measured; the latency operating points)")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    tok = Tok()
    t0 = time.perf_counter()
    vqa_cfg, vsm_cfg = vqa_llm_7b(), vsm_7b()
    vqa_params = _sync(init_vqa_llm_params(
        jax.random.PRNGKey(0), vqa_cfg, dtype=jnp.bfloat16,
        quantize_llm=True if args.mixed else "int4"))
    if args.mixed:
        # quantize each model's towers BEFORE building the next model:
        # with the int4mix VSM the pair is 12.4 GB live, and the ~1 GB of
        # still-bf16 VQA towers plus the quantizer's f32 transients
        # measurably OOM'd the VSM's lm_head init (r5)
        from vstar_tpu.nn.quant import quantize_model_towers
        vqa_params = quantize_model_towers(vqa_params)
    vsm_params = _sync(init_vsm_params(
        jax.random.PRNGKey(1), vsm_cfg, dtype=jnp.bfloat16,
        quantize_llm=args.vsm_quant))
    if args.mixed:
        vsm_params = quantize_model_towers(vsm_params)
    print(f"[load] {'mixed int8/int4' if args.mixed else 'int4'} pair "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    vqa = ShortVQA(vqa_params, vqa_cfg, tok, prompt_buckets=(512, 768),
                   option_bucket=64)
    vsm = CompiledVSMSearch(
        BatchedVSMEngine(vsm_params, vsm_cfg, tok, loc_token_id=3,
                         max_new_tokens=MAX_NEW_TOKENS,
                         prompt_buckets=(384,), device_preprocess=True,
                         speculative_template=None),
        P=8, batch_buckets=tuple(sorted({1, 2, 4, *args.batches,
                                         args.conc})))

    rng = np.random.RandomState(0)

    def fresh_requests(n):
        return [(Image.fromarray(rng.randint(0, 255, (*args.image_hw, 3),
                                             dtype=np.uint8)),
                 f"is the small object number {i} red or blue ?",
                 ["red thing", "blue thing", "green", "none"])
                for i in range(n)]

    svc_kw = dict(minimum_size_scale=4.0, minimum_size=224,
                  max_search_steps=SEARCH_STEPS,
                  missing_parser=lambda p: ["red mug"],
                  search_kwargs=dict(FORCED))

    # Latency-throughput curve over max_batch at FIXED offered load
    # (args.conc closed-loop callers): max_batch=1 is the reference's
    # blocking queue shape (but saturated — its queue wait shows up in
    # latency, as a deployment would feel it); larger wave sizes trade
    # per-request latency for shared weight reads. VERDICT r4 #5: report
    # tails + TTFR per point so a deployment can pick an operating point.
    def live_gb():
        return sum(int(np.prod(x.shape)) * x.dtype.itemsize
                   for x in jax.live_arrays()) / 1024 ** 3

    rows = []
    base_rps = None
    for b in args.batches:
        print(f"[mem] live device arrays before max_batch={b}: "
              f"{live_gb():.2f} GB", flush=True)
        svc = ContinuousSealService(vqa, vsm, max_batch=b,
                                    window_ms=args.window_ms, **svc_kw)
        # warm: compile this wave size end to end (trigger/search/MC)
        drive(svc, fresh_requests(max(b, 2)), conc=max(b, 2))
        stats, _ = drive(svc, fresh_requests(args.n), conc=args.conc)
        st = svc.stats()
        svc.close()
        stats["max_batch"] = b
        stats["mean_wave"] = st["mean_wave"]
        stats["oom_splits"] = st.get("oom_splits", 0)
        stats["wave_cap"] = st.get("wave_cap")
        if base_rps is None:
            base_rps = stats["req_per_s"]
        rows.append(stats)
        speedup = (stats["req_per_s"] / base_rps if base_rps
                   else float("nan"))   # all-failed first point
        print(f"max_batch={b}: {stats['req_per_s']:5.3f} req/s "
              f"({speedup:.2f}x), "
              f"p50 {stats['p50_s']:.2f} p90 {stats['p90_s']:.2f} "
              f"max {stats['max_s']:.2f} s, ttfr {stats['ttfr_s']:.2f} s, "
              f"mean wave {stats['mean_wave']:.1f} "
              f"(n={stats['n']}, conc={args.conc}, "
              f"oom_splits={stats['oom_splits']}, "
              f"wave_cap={stats['wave_cap']})", flush=True)
    print("\nlatency-throughput table (offered conc "
          f"{args.conc}, window {args.window_ms} ms, n {args.n}/point; "
          "p90/max on n samples — treat max as the tail proxy):",
          flush=True)
    for s in rows:
        print(f"  {s['max_batch']:2d}  {s['req_per_s']:6.3f} req/s  "
              f"p50 {s['p50_s']:6.2f}  p90 {s['p90_s']:6.2f}  "
              f"max {s['max_s']:6.2f}  ttfr {s['ttfr_s']:5.2f}",
              flush=True)


if __name__ == "__main__":
    main()
