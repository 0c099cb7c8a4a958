"""Benchmark: the full SEAL V*Bench loop AND the full-search p50, both
measured end to end on real TPU.

Two measured units (nothing composed from parts):

1. `seal_e2e_images_per_s` (r4, the BASELINE.json headline workload that
   had never RUN on one chip): the complete SEAL loop of
   /root/reference/vstar_bench_eval.py:168-280 — free-form trigger ->
   guided searches -> focus re-ask, BOTH 7B models — over a synthetic
   V*Bench via phase-swapped weight residency (eval/phased.py): only one
   model resident at a time, ONE swap per phase boundary amortized over
   the dataset. The engine objects (and their compiled programs) persist
   across swaps; only the weights are dropped and re-created — exactly
   what a production phase swap does. Steady state: one warm pass
   (absorbs compiles), then >= 2 measured passes; the headline is the
   MEDIAN pass (best + the full list reported alongside). Decode budgets
   are disclosed in the JSON (default free-form 32 / search 16 new
   tokens; `--ref-budgets` runs the reference's 200/100 caps once per
   round for the envelope — BASELINE.md carries that row).

2. `seal_full_search_p50_latency` (r2/r3 headline, still `value` for
   cross-round continuity): each rep runs `CompiledVSMSearch.search` —
   canvas upload, on-device window extraction, CLIP-L + 7B prefill +
   speculative decode + OWL-ViT + heads, and the on-device
   queue/threshold/split/scoring policy — for a 3-step target-cue
   descent (the paper's average successful path length ~3;
   arXiv 2312.14135) on a 2K image.

Prints ONE JSON line:
  {"metric": "seal_full_search_p50_latency", "value": <seconds>,
   "unit": "s", "vs_baseline": <2.0 / value>,
   "seal_e2e_images_per_s": ..., "seal_e2e_amortized_images_per_s": ...,
   "seal_e2e_phases_s": ..., "seal_e2e_swap_s": ..., ...}
vs_baseline > 1 means the 2-second full-search target is beaten.

Scenario control (weights are random at the full seal_vsm_7b shape — the
public checkpoints cannot be downloaded here): the thresholds are search
*parameters*, so confidence_high=2 / target-cue thresholds < 0 pin every
step to the detect+target-cue regime for exactly max_steps=3 steps — the
control-flow path real checkpoints take (they additionally accept early,
which only shortens the search). The image is NOISE (incompressible, so
the relay's transport compression cannot shrink the 2K canvas upload the
way a synthetic flat image would). The speculative draft is the model's
own greedy answer probed on the image's root window (deployment's
template matches every step by training; random weights guarantee a
match only at the root — deeper steps that diverge pay the greedy rate,
making `value` conservative vs real checkpoints).

Reported alongside (honesty knobs):
  * uniform_scene_search_s — the same search on a uniform image: every
    window matches the draft, timing the full-acceptance path real
    checkpoints take (its upload compresses, so it also bounds the
    PCIe-local upload story)
  * greedy_floor_search_s — same measured search with speculation off
  * step/upload component p50s and the synthetic path-length
    distribution backing the 3-step choice

Canvas-prefetch overlap (BatchedVSMEngine.prefetch_canvas) is NOT timed
here: the axon relay serializes transfers FIFO, so a concurrent prefetch
upload queues AHEAD of the search's own dispatches instead of
overlapping (measured 3.2 s/search pipelined vs 0.72 serial, r3). The
feature targets PCIe-local deployments where transfers and compute
genuinely overlap; on the relay the engines simply upload on first use.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts"))
from bench_common import FORCED_SEARCH, sync_params  # noqa: E402

MAX_NEW_TOKENS = 16
SEARCH_STEPS = 3


def measured_path_steps(n_per_task: int = 3):
    """Mean + distribution of guided-search path lengths on the synthetic
    benchmark (host-side scripted engines; no device work)."""
    import tempfile
    from vstar_tpu.eval.synthetic import run_synthetic_eval
    with tempfile.TemporaryDirectory() as td:
        acc, _, plens, _ = run_synthetic_eval(td, n_per_task=n_per_task,
                                              seed=0)
    assert acc == 1.0, f"synthetic SEAL accuracy {acc} != 1.0"
    return float(np.mean(plens)), plens


def _tok():
    """Deterministic hash tokenizer (the real vocab files are
    checkpoint-gated) — the single shared implementation lives in
    scripts/bench_common.py."""
    from bench_common import Tok
    return Tok()


FORCED = dict(smallest_size=512, target_cue_threshold_decay=0.7,
              max_steps=SEARCH_STEPS, **FORCED_SEARCH)


def probe_platform(timeout_s: float = 180.0):
    """`jax.devices()` in a SUBPROCESS with a deadline.

    When the axon relay tunnel is down, axon backend init blocks forever
    (observed r3: jax.devices() hung > 240 s) — and the driver runs
    bench.py without a timeout, so a hung probe would hang the round.
    Probing in a throwaway subprocess bounds the damage; on timeout the
    caller falls back to the CPU smoke path with `degraded: true` so a
    JSON line is always produced."""
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLAT=' + jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("PLAT="):
            return line[5:].strip()
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--w8a8", action="store_true", default=False,
                    help="opt-in int8-activation matmuls (1.42x prefill "
                    "measured; accuracy unvalidated on real weights — "
                    "see nn/quant.set_act_int8)")
    ap.add_argument("--e2e-n", dest="e2e_n", type=int, default=None,
                    help="synthetic benchmark size for the seal_e2e "
                    "section (default 12 on TPU / 4 on CPU; larger N "
                    "amortizes the phase swaps toward the steady rate — "
                    "the real V*Bench is 191 images)")
    ap.add_argument("--e2e-passes", dest="e2e_passes", type=int, default=3,
                    help="steady passes after the warm pass; the headline "
                    "is the MEDIAN (lower-middle for even counts; best "
                    "also reported)")
    ap.add_argument("--ref-budgets", dest="ref_budgets",
                    action="store_true", default=False,
                    help="use the reference's decode caps (free-form 200 "
                    "new tokens, search decode 100 — vstar_bench_eval.py"
                    ":79 / visual_search.py:204) instead of the default "
                    "32/16; with random weights every decode runs to the "
                    "cap, so this is the reference-budget ENVELOPE run "
                    "(measured once per round for BASELINE.md)")
    args = ap.parse_args(argv)
    # Probe BEFORE importing any vstar_tpu module: an import that touches
    # a jnp op initializes the backend, and a broken relay turns that
    # into an unbounded hang with no JSON line (observed r3: 26 min inside
    # `import vstar_tpu.search.compiled` before UNAVAILABLE). The probe
    # also treats a crashing backend (UNAVAILABLE, not just a hang) as
    # down — anything that is not a clean platform answer degrades to CPU.
    # One retry after a pause: transient relay blips at measurement time
    # should not demote the round's number to a CPU smoke.
    degraded = False
    plat = probe_platform()
    if plat is None:
        time.sleep(60)
        plat = probe_platform()
    if plat is None:
        jax.config.update("jax_platforms", "cpu")
        degraded = True
    platform = jax.devices()[0].platform

    free_form_budget = 200 if args.ref_budgets else 32
    search_decode_budget = 100 if args.ref_budgets else MAX_NEW_TOKENS

    if args.w8a8:
        from vstar_tpu.nn.quant import set_act_int8
        set_act_int8(True)
    from vstar_tpu.core.config import vqa_llm_7b, vsm_7b
    from vstar_tpu.eval.vqa_engine import VQAEngine
    from vstar_tpu.models.vqa_llm import init_vqa_llm_params
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.batched import BatchedVSMEngine
    from vstar_tpu.search.compiled import CompiledVSMSearch
    cfg = vsm_7b()
    vqa_cfg = vqa_llm_7b()
    img_hw = (1536, 2048)
    forced = dict(FORCED)
    n_e2e = 12
    if platform != "tpu":
        # CI / CPU smoke: shrink the decoders + image, identical pipeline.
        import dataclasses

        def small_llama(c):
            return dataclasses.replace(c, num_layers=2, hidden_size=512,
                                       intermediate_size=1024, num_heads=4,
                                       num_kv_heads=4)
        cfg = dataclasses.replace(
            cfg, llama=small_llama(cfg.llama),
            # the projector feeds the decoder: its out_dim must track the
            # shrunk hidden size or splicing fails on a 4096-dim bank
            projector=dataclasses.replace(cfg.projector, out_dim=512),
            # shallow towers, same geometry (224/768 inputs, grid sizes,
            # feature dims): the smoke exercises every program shape
            # while staying minutes, not tens of minutes, on CPU
            vision=dataclasses.replace(cfg.vision, num_layers=2),
            owl_vision=dataclasses.replace(cfg.owl_vision, num_layers=2))
        vqa_cfg = dataclasses.replace(
            vqa_cfg, llama=small_llama(vqa_cfg.llama),
            projector_image=dataclasses.replace(vqa_cfg.projector_image,
                                                out_dim=512),
            projector_object=dataclasses.replace(vqa_cfg.projector_object,
                                                 out_dim=512),
            vision=dataclasses.replace(vqa_cfg.vision, num_layers=2))
        img_hw = (384, 512)
        forced["smallest_size"] = 128
        args.repeats = min(args.repeats, 2)   # CPU smoke only
        args.e2e_passes = 1
        n_e2e = 4

    quantize = platform == "tpu"
    tok = _tok()

    _sync = sync_params   # relay-safe init sync (bench_common)

    # Engine singletons: the phased runner swaps WEIGHTS, the engines
    # (and their compiled programs) persist — the production phase-swap
    # design. vsm_factory's engine is also the search-p50 section's.
    holders = {}

    def vqa_factory():
        params = _sync(init_vqa_llm_params(
            jax.random.PRNGKey(0), vqa_cfg, dtype=jnp.bfloat16,
            quantize_llm=quantize))
        if "vqa" not in holders:
            holders["vqa"] = VQAEngine(params, vqa_cfg, tok,
                                       prompt_buckets=(512, 768),
                                       option_bucket=64)
        else:
            holders["vqa"].params = params
        return holders["vqa"]

    def vsm_factory():
        params = _sync(init_vsm_params(
            jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16,
            quantize_llm=quantize))
        if "vsm" not in holders:
            eng = BatchedVSMEngine(params, cfg, tok, loc_token_id=3,
                                   max_new_tokens=search_decode_budget,
                                   prompt_buckets=(384,),
                                   device_preprocess=True,
                                   speculative_template=None)
            # P=8 covers the forced 3-step searches (growth engages if a
            # regime ever needs more); the B=8 bucket batches phase-2
            # searches 8 at a time (r3: 1.22x over B=4)
            holders["vsm"] = CompiledVSMSearch(eng, P=8,
                                               batch_buckets=(1, 2, 4, 8))
        else:
            holders["vsm"].engine.params = params
        return holders["vsm"]

    # ---- measured unit 1: the full SEAL loop, phase-swapped ------------
    import tempfile

    from vstar_tpu.eval.phased import eval_model_phased
    from vstar_tpu.eval.synthetic import make_synthetic_benchmark

    e2e_dir = tempfile.mkdtemp(prefix="vstar_e2e_")
    if args.e2e_n:
        n_e2e = args.e2e_n
    make_synthetic_benchmark(e2e_dir, n_per_task=n_e2e // 2,
                             image_hw=img_hw)
    phased_kw = dict(
        # B=8 waves for phases 1+3 (measured 3.59 vs 2.86 images/s plain;
        # HBM bounded at 11.9/16 GB by scripts/hbm_probe.py) and for the
        # batched fused searches (r3: 1.22x over B=4)
        batch=8, free_form_max_new_tokens=free_form_budget,
        max_search_steps=SEARCH_STEPS,
        # the forced target-cue regime (same control path as the p50
        # unit: real checkpoints additionally accept early)
        search_kwargs=dict(
            confidence_high=forced["confidence_high"],
            target_cue_threshold=forced["target_cue_threshold"],
            target_cue_threshold_minimum=(
                forced["target_cue_threshold_minimum"])),
        # random weights never emit the trigger sentence: the free-form
        # phase runs (and is timed) in full, the searched objects come
        # from the annotations — every image pays one search
        force_missing=lambda s: list(s["annotation"]["target_object"]),
        log=None)
    if platform == "tpu":
        eval_model_phased(e2e_dir, vqa_factory, vsm_factory,
                          **phased_kw)             # warm pass (compiles)
    # >= 2 steady passes: headline = MEDIAN (driver-reproducible), best
    # also reported (the repo's min-over-reps steady convention)
    passes = []
    for _ in range(max(1, args.e2e_passes)):
        _, _, t = eval_model_phased(e2e_dir, vqa_factory, vsm_factory,
                                    **phased_kw)
        passes.append(t)
    rates = [t["images_per_s_steady"] for t in passes]
    # median pass; for EVEN pass counts take the lower middle — the upper
    # middle of 2 passes is just the best one, which is exactly the
    # optimistic-selection bias the median headline exists to remove
    e2e = passes[int(np.argsort(rates)[(len(rates) - 1) // 2])]

    # ---- measured unit 2: full-search p50 (VSM weights resident) -------
    comp = vsm_factory()
    eng = comp.engine

    _seed = [0]

    def fresh_noise():
        # incompressible content + a NEW object per rep: the full 2K
        # canvas upload is counted every search
        _seed[0] += 1
        r = np.random.RandomState(_seed[0])
        return Image.fromarray(r.randint(0, 255, (*img_hw, 3),
                                         dtype=np.uint8))

    def fresh_uniform():
        return Image.fromarray(np.full((*img_hw, 3), 128, np.uint8))

    from vstar_tpu.search.policy import PatchRef

    def probe_draft(img):
        # deployment-shaped draft: the model's own greedy answer on the
        # image's root window, probed through the SAME canvas-window
        # extraction the fused search uses (the host PIL path resamples
        # differently and its tokens would mismatch)
        ref = PatchRef(img, [0, 0, img.width, img.height])
        out, _ = eng._run_many(
            [ref], ["Please locate the red mug in this image."])
        ng = int(out.num_generated[0])
        toks = [int(t) for t in np.asarray(out.tokens[0, :ng])]
        row = np.full(search_decode_budget + eng.spec_chunk, eng.eos_id,
                      np.int32)
        row[:min(len(toks), len(row))] = toks[:len(row)]
        return row

    def timed_searches(n, make_image, draft=True):
        imgs = [make_image() for _ in range(n)]
        if draft:
            rows = [probe_draft(im) for im in imgs]  # outside the timer:
            # deployment's draft is a fixed training template
            # probing uploaded the canvases — evict so the timed search
            # pays its own upload
            with eng._canvas_lock:
                eng._canvas_cache.clear()
        ts = []
        for i, im in enumerate(imgs):
            eng._draft_row = rows[i] if draft else None
            t0 = time.perf_counter()
            _, plen, _, _ = comp.search(im, "red mug", **forced)
            # SEARCH_STEPS steps always execute; plen is the fallback
            # step's index (the search never accepts at conf_high=2)
            assert 0 <= plen <= SEARCH_STEPS, plen
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    eng._draft_row = probe_draft(fresh_noise())
    comp.search(fresh_noise(), "red mug", **forced)   # compile + warm
    search_p50 = timed_searches(args.repeats, fresh_noise)
    uniform_p50 = timed_searches(3, fresh_uniform)

    # greedy floor: speculation off (draft=None is a separate program)
    eng._draft_row = None
    comp.search(fresh_noise(), "red mug", **forced)   # compile greedy form
    greedy_search_p50 = timed_searches(3, fresh_noise, draft=False)

    # --- component probes (context for the headline) -------------------
    checksum = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    dummy = jnp.ones((2304,), jnp.float32)
    float(np.asarray(checksum(dummy)))
    ovh = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(checksum(dummy)))
        ovh.append(time.perf_counter() - t0)
    overhead = float(np.percentile(ovh, 50))

    def step_probe():
        """One VSM search step (windows already on device), matched
        draft — the r1/r2 'step_p50_s' unit, for continuity."""
        img = fresh_noise()
        patch = PatchRef(img, [0, 0, img.width, img.height])
        eng._draft_row = probe_draft(img)   # matched (template-hit) draft
        eng.detect_many([patch], ["red mug"])          # warm + canvas
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            eng.detect_many([patch], ["red mug"])
            ts.append(time.perf_counter() - t0)
        return max(1e-4, float(np.percentile(ts, 50)) - overhead)

    step_p50 = step_probe()

    # canvas upload (uint8 2K through the relay + on-device normalize;
    # scalar-fetch synced — the dispatch alone returns early)
    ups = []
    for _ in range(4):
        im = fresh_noise()
        t0 = time.perf_counter()
        dev = eng._canvas(im)
        float(np.asarray(dev[0, 0, 0]))
        ups.append(time.perf_counter() - t0)
    canvas_upload = float(np.percentile(ups[1:], 50))  # first may compile

    mean_plen, plens = measured_path_steps()

    print(json.dumps({
        "metric": "seal_full_search_p50_latency",
        "value": round(search_p50, 4),
        "unit": "s",
        "vs_baseline": round(2.0 / search_p50, 3),
        "search_steps": SEARCH_STEPS,
        "uniform_scene_search_s": round(uniform_p50, 4),
        "greedy_floor_search_s": round(greedy_search_p50, 4),
        "step_p50_s": round(step_p50, 4),
        "canvas_upload_2k_s": round(canvas_upload, 4),
        "path_lengths_synthetic": plens,
        "mean_path_synthetic": round(mean_plen, 2),
        "seal_e2e_images_per_s": round(e2e["images_per_s_steady"], 4),
        "seal_e2e_images_per_s_best": round(max(rates), 4),
        "seal_e2e_passes": [round(r, 4) for r in rates],
        "seal_e2e_amortized_images_per_s": round(
            e2e["images_per_s_amortized"], 4),
        "seal_e2e_n_images": e2e["n_images"],
        "seal_e2e_phases_s": [round(e2e["phase1_s"], 3),
                              round(e2e["phase2_s"], 3),
                              round(e2e["phase3_s"], 3)],
        "seal_e2e_swap_s": round(e2e["swap_total_s"], 3),
        "seal_e2e_decode_budgets": [free_form_budget, search_decode_budget],
        "platform": platform,
        **({"degraded": True} if degraded else {}),
        "definition": "value: r3 definition — measured wall-clock p50 of "
                      "CompiledVSMSearch.search on a fresh 2K image "
                      "(canvas upload + 3 target-cue detect steps in ONE "
                      "fused dispatch). seal_e2e_*: r4 — the COMPLETE "
                      "SEAL loop (free-form trigger -> one 3-step fused "
                      "search per image -> focus option scoring, both 7B "
                      "models) over a synthetic 2K V*Bench on ONE chip "
                      "via phase-swapped weight residency; headline = "
                      "MEDIAN of seal_e2e_passes steady passes after a "
                      "warm pass; compiled programs persist across swaps, "
                      "weights re-created per phase (swap cost reported; "
                      "amortized divides by compute+swaps). Decode "
                      "budgets seal_e2e_decode_budgets = [free-form, "
                      "search] max_new_tokens; default 32/16 sized to "
                      "realistic answer lengths (the reference CAPS are "
                      "200/100 — vstar_bench_eval.py:79, "
                      "visual_search.py:204; random weights always decode "
                      "to the cap, so --ref-budgets measures that "
                      "envelope, recorded in BASELINE.md). Random weights "
                      "force the worst control path everywhere; no "
                      "composed estimates.",
    }))


if __name__ == "__main__":
    main()
