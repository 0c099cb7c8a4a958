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

Compares serialized serving (max_batch=1 — the reference's blocking
Gradio queue shape) against continuous batching at 8 concurrent (waves
share every weight read across phases). Steady state: each mode is driven
twice and the second round is reported.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
       scripts/serve_seal_bench.py [--n 16] [--conc 8]
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
    submissions). Returns (req/s, p50 s, recs).

    Note: when conc == the service's max_batch and requests are
    homogeneous, waves complete in lockstep and this measures the same
    schedule a gated driver would; the closed loop matters when conc and
    max_batch diverge."""
    recs = [None] * len(reqs)
    it = iter(range(len(reqs)))
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            img, q, opts = reqs[i]
            recs[i] = service.answer(img, q, opts)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lats = [r["latency_s"] for r in recs]
    return len(reqs) / wall, float(np.percentile(lats, 50)), recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--conc", type=int, default=8)
    ap.add_argument("--image-hw", type=int, nargs=2, default=[1536, 2048])
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    tok = Tok()
    t0 = time.perf_counter()
    vqa_cfg, vsm_cfg = vqa_llm_7b(), vsm_7b()
    vqa_params = _sync(init_vqa_llm_params(
        jax.random.PRNGKey(0), vqa_cfg, dtype=jnp.bfloat16,
        quantize_llm="int4"))
    vsm_params = _sync(init_vsm_params(
        jax.random.PRNGKey(1), vsm_cfg, dtype=jnp.bfloat16,
        quantize_llm="int4"))
    print(f"[load] int4 pair {time.perf_counter()-t0:.1f}s", flush=True)

    vqa = ShortVQA(vqa_params, vqa_cfg, tok, prompt_buckets=(512, 768),
                   option_bucket=64)
    vsm = CompiledVSMSearch(
        BatchedVSMEngine(vsm_params, vsm_cfg, tok, loc_token_id=3,
                         max_new_tokens=MAX_NEW_TOKENS,
                         prompt_buckets=(384,), device_preprocess=True,
                         speculative_template=None),
        P=8, batch_buckets=(1, 2, 4, args.conc))

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

    # serialized shape: the reference's blocking batch-1 queue
    serial = ContinuousSealService(vqa, vsm, max_batch=1, **svc_kw)
    drive(serial, fresh_requests(2), conc=1)            # compile B=1
    r1, p1, _ = drive(serial, fresh_requests(args.n // 2), conc=1)
    serial.close()
    print(f"serialized (max_batch=1):   {r1:5.3f} req/s, p50 {p1:.2f} s",
          flush=True)

    cont = ContinuousSealService(vqa, vsm, max_batch=args.conc,
                                 window_ms=50.0, **svc_kw)
    drive(cont, fresh_requests(args.conc), conc=args.conc)  # compile B=8
    r8, p8, _ = drive(cont, fresh_requests(args.n), conc=args.conc)
    st = cont.stats()
    cont.close()
    print(f"continuous ({args.conc} concurrent): {r8:5.3f} req/s, "
          f"p50 {p8:.2f} s ({r8 / r1:.2f}x, waves {st['waves']}, "
          f"mean wave {st['mean_wave']:.1f})", flush=True)


if __name__ == "__main__":
    main()
