"""Phase-swapped single-chip V*Bench evaluation.

The SEAL loop (/root/reference/vstar_bench_eval.py:168-280) interleaves
two 7B models per image; their int8 pair (~15 GB of weights) measurably
does not fit one 16 GB v5e together with activations/KV (BASELINE.md r2).
This runner executes the SAME loop with only ONE model resident at a
time by re-ordering it around weight residency:

  phase 1  VQA resident:  free-form trigger over ALL images (batched)
  swap     drop the VQA engine, build the VSM engine (ONE swap,
           amortized over the whole dataset — not per image)
  phase 2  VSM resident:  every sample's searches, grouped + batched
           (fused whole-search programs when the factory wraps the
           engine in CompiledVSMSearch)
  swap     drop the VSM engine, rebuild the VQA engine
  phase 3  VQA resident:  focus re-ask / option scoring over ALL samples

Per-sample records are identical to eval_model's serial loop (the phase
pieces are shared with eval/seal.py; asserted in
tests/test_phased_eval.py): the phases only reorder INDEPENDENT samples,
never the data flow within one.

Engines are produced by zero-arg factories so each phase controls weight
residency: with real checkpoints a factory re-reads the HF directory and
re-uploads (~7.5 GB int8: minutes through the relay, ~1 s PCIe-local);
the benchmark factories re-init random weights on device. `free_engine`
drops the parameter references so XLA actually releases the HBM before
the next factory runs.
"""

from __future__ import annotations

import gc
import json
import os
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import numpy as np

from .seal import (collect_search_results, focus_inputs,
                   parse_missing_objects, seal_record, smallest_size)

TEST_TYPES = ("direct_attributes", "relative_position")


def iter_benchmark(benchmark_folder: str) -> List[Dict]:
    """V*Bench samples in eval_model's walk order: [{test_type, file,
    path, question, options, annotation}]."""
    samples = []
    for test_type in TEST_TYPES:
        folder = os.path.join(benchmark_folder, test_type)
        if not os.path.isdir(folder):
            continue
        for image_file in sorted(os.listdir(folder)):
            if ".json" in image_file:
                continue
            path = os.path.join(folder, image_file)
            ann = json.load(open(path.rsplit(".", 1)[0] + ".json"))
            samples.append({"test_type": test_type, "file": image_file,
                            "path": path, "question": ann["question"],
                            "options": ann["options"],
                            "annotation": ann})
    return samples


def free_engine(engine) -> None:
    """Drop an engine's device residency (params, canvas cache) so the
    next phase's weights fit. The caller must also drop its own
    references; jitted executables hold no argument buffers, so this is
    sufficient for XLA to free the HBM."""
    if engine is None:
        return
    inner = getattr(engine, "engine", None)   # CompiledVSMSearch wraps
    if inner is not None:
        free_engine(inner)
    engine.params = None
    cache = getattr(engine, "_canvas_cache", None)
    if cache is not None:
        cache.clear()
    gc.collect()


def parked_factory(factory: Callable[[], object]):
    """Wrap an engine factory so phase swaps re-upload weights from a
    HOST-RAM copy instead of re-running the factory's checkpoint read.

    First call: runs `factory()`, fetches the engine's param pytree to
    host (numpy), and records each leaf's sharding so reloads restore
    mesh-sharded layouts rather than replicating onto the default
    device. Later calls: re-upload the parked copy with device_put —
    on PCIe-local hosts that is seconds for a 7B int8 model vs
    re-reading + re-keying an HF directory — then sync via a scalar
    fetch so the caller's swap timer counts the actual upload
    (device_put is async; block_until_ready can return early through
    the relay). The engine OBJECT (and its compiled programs)
    persists; only `params` is re-created, matching free_engine's
    contract.

    Do NOT use through the axon relay: its device->host fetches run at
    ~70 KB/s, so parking a 7 GB model would take hours. The relay
    benchmarks re-init weights on device instead (bench.py factories).
    """
    import jax
    import jax.numpy as jnp

    state: Dict = {}

    def wrapped():
        if "engine" not in state:
            eng = factory()
            inner = getattr(eng, "engine", eng)   # CompiledVSMSearch wraps
            state["engine"], state["inner"] = eng, inner
            state["shardings"] = jax.tree_util.tree_map(
                lambda x: x.sharding, inner.params)
            state["host"] = jax.device_get(inner.params)
            return eng
        params = jax.tree_util.tree_map(
            lambda h, s: jax.device_put(h, s),
            state["host"], state["shardings"])
        jax.block_until_ready(params)
        # relay gotcha: block_until_ready can return early there — a
        # scalar fetch of the last-enqueued leaf closes it (transfers
        # are FIFO on the relay)
        leaf = jax.tree_util.tree_leaves(params)[-1]
        float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
        state["inner"].params = params
        return state["engine"]

    return wrapped


def _chunks(seq, n):
    for a in range(0, len(seq), n):
        yield seq[a:a + n]


def eval_model_phased(benchmark_folder: str,
                      vqa_factory: Callable[[], object],
                      vsm_factory: Callable[[], object],
                      output_path: Optional[str] = None,
                      minimum_size_scale: float = 4.0,
                      minimum_size: int = 224,
                      batch: int = 4,
                      free_form_max_new_tokens: int = 200,
                      max_search_steps: Optional[int] = None,
                      search_kwargs: Optional[Dict] = None,
                      force_missing: Optional[Callable[[Dict],
                                                       List[str]]] = None,
                      coresident: bool = False,
                      log=print):
    """Run the full V*Bench SEAL loop phase-swapped on one chip.

    force_missing: optional sample -> object-name list override applied
    AFTER the (still fully executed and timed) free-form phase — the
    throughput benchmark uses it because random weights never emit the
    trigger sentence; real checkpoints leave it None.

    coresident: build BOTH engines up front and skip every swap — the
    int4-pair mode (~9 GB of weights: both 7B decoders fit one 16 GB
    chip, measured r4). The phases still run batched in the same order
    (that is the throughput-optimal shape regardless of residency); only
    the frees/reloads disappear, so swap_total_s is 0 and amortized ==
    steady.

    Returns (results, per_type_acc, timings) where timings carries the
    measured per-phase wall clock, the swap costs, and the derived
    images/sec (amortized over this dataset and steady-state excluding
    swaps)."""
    from ..data.preprocess import expand2square
    from ..search.batched import run_grouped_searches

    samples = iter_benchmark(benchmark_folder)
    n = len(samples)
    if n == 0:
        raise FileNotFoundError(f"no samples under {benchmark_folder}")

    # Images are decoded per phase chunk, never held for the whole run:
    # at real V*Bench scale (~191 2K images) eagerly holding every
    # decoded RGB plus its expand2square copy costs multiple GB of host
    # RAM for no benefit — each phase touches a bounded window. The
    # serial loop decodes once per image too; host JPEG decode is noise
    # next to the 7B phases.
    from PIL import Image

    def _open(i):
        return Image.open(samples[i]["path"]).convert("RGB")

    def _dims(i):
        with Image.open(samples[i]["path"]) as im:   # header only
            return im.width, im.height

    timings: Dict[str, float] = {}

    # ---- phase 1: free-form trigger (VQA resident) ---------------------
    t0 = time.perf_counter()
    vqa = vqa_factory()
    timings["load_vqa_s"] = time.perf_counter() - t0
    vsm = None
    if coresident:
        t0 = time.perf_counter()
        vsm = vsm_factory()
        timings["load_vsm_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    predictions: List[str] = []
    if hasattr(vqa, "free_form_many"):
        for idx_chunk in _chunks(list(range(n)), batch):
            predictions.extend(vqa.free_form_many(
                [expand2square(_open(i))[0] for i in idx_chunk],
                [samples[i]["question"] for i in idx_chunk],
                max_new_tokens=free_form_max_new_tokens))
    else:
        predictions = [vqa.free_form(expand2square(_open(i))[0],
                                     samples[i]["question"],
                                     max_new_tokens=(
                                         free_form_max_new_tokens))
                       for i in range(n)]
    timings["phase1_s"] = time.perf_counter() - t0
    missing = [parse_missing_objects(p) for p in predictions]
    if force_missing is not None:
        missing = [force_missing(s) for s in samples]

    # ---- swap 1: VQA out, VSM in (skipped when co-resident) ------------
    if not coresident:
        t0 = time.perf_counter()
        free_engine(vqa)
        vqa = None
        timings["free_vqa_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        vsm = vsm_factory()
        timings["load_vsm_s"] = time.perf_counter() - t0
    else:
        timings["free_vqa_s"] = 0.0

    # ---- phase 2: all searches (VSM resident) --------------------------
    t0 = time.perf_counter()
    tasks = []
    owners = []          # task index -> sample index
    # ONE memoized loader per sample, all sharing a one-slot decode
    # cache: every engine path then sees the SAME decoded object for a
    # sample's consecutive tasks (the serial and by_small drivers call
    # the loader once per TASK — only the compiled path checks loader
    # identity, search/batched.py:419-422 — so without memoization the
    # id()-keyed canvas cache never hit for multi-object samples). The
    # one-slot cache keeps host RAM bounded at 191-image scale: a
    # sample's decode dies when the next sample's loader fires, never
    # accumulating in the task closures.
    _slot: Dict = {}

    def _sample_loader(i):
        def load():
            if _slot.get("i") != i:
                _slot["i"], _slot["im"] = i, _open(i)
            return _slot["im"]
        return load

    for i in range(n):
        if not missing[i]:
            continue
        w, h = _dims(i)
        smallest = smallest_size(w, h, minimum_size_scale, minimum_size)
        loader = _sample_loader(i)
        for name in missing[i]:
            tasks.append({"image": loader, "name": name,
                          "smallest": smallest})
            owners.append(i)
    search_results: List[List[Dict]] = [[] for _ in range(n)]
    if tasks:
        outs = run_grouped_searches(vsm, tasks,
                                    max_steps=max_search_steps,
                                    **(search_kwargs or {}))
        per_sample_outs: Dict[int, list] = defaultdict(list)
        per_sample_names: Dict[int, list] = defaultdict(list)
        for t, o, i in zip(tasks, outs, owners):
            per_sample_outs[i].append(o)
            per_sample_names[i].append(t["name"])
        for i in per_sample_outs:
            search_results[i] = collect_search_results(
                per_sample_names[i], per_sample_outs[i])
    _slot.clear()      # drop the last sample's decode with its phase
    timings["phase2_s"] = time.perf_counter() - t0
    timings["n_searches"] = len(tasks)

    # ---- swap 2: VSM out, VQA back (skipped when co-resident) -----------
    if not coresident:
        t0 = time.perf_counter()
        free_engine(vsm)
        vsm = None
        timings["free_vsm_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        vqa = vqa_factory()
        timings["reload_vqa_s"] = time.perf_counter() - t0
    else:
        timings["free_vsm_s"] = timings["reload_vqa_s"] = 0.0

    # ---- phase 3: focus re-ask / option scoring (VQA resident) ---------
    t0 = time.perf_counter()

    def _row(i):
        if missing[i]:
            return focus_inputs(vqa, _open(i), samples[i]["question"],
                                search_results[i])
        return (expand2square(_open(i))[0], samples[i]["question"],
                None, None, None)

    chosen: List[int] = []
    if hasattr(vqa, "multiple_choice_many"):
        for idx_chunk in _chunks(list(range(n)), batch):
            rows = [_row(i) for i in idx_chunk]
            chosen.extend(vqa.multiple_choice_many(
                [r[0] for r in rows],
                [r[1] for r in rows],
                [samples[i]["options"] for i in idx_chunk],
                [r[2] for r in rows],
                [r[3] for r in rows],
                [r[4] for r in rows]))
    else:
        for i in range(n):
            r = _row(i)
            chosen.append(vqa.multiple_choice(r[0], r[1],
                                              samples[i]["options"], r[2],
                                              images_long=r[3],
                                              objects_long=r[4]))
    timings["phase3_s"] = time.perf_counter() - t0
    free_engine(vqa)
    vqa = None
    if coresident:
        free_engine(vsm)
        vsm = None

    # ---- assemble --------------------------------------------------------
    results: Dict[str, list] = {t: [] for t in TEST_TYPES}
    per_type = defaultdict(list)
    for i, s in enumerate(samples):
        rec = seal_record(s["question"], s["options"], predictions[i],
                          missing[i], search_results[i], chosen[i])
        rec["image"] = s["file"]
        results[s["test_type"]].append(rec)
        per_type[s["test_type"]].append(rec["correct"])

    compute = (timings["phase1_s"] + timings["phase2_s"]
               + timings["phase3_s"])
    # co-resident: load_vsm_s is part of the up-front build, not a swap
    swaps = (timings["free_vqa_s"] + timings["free_vsm_s"]
             + timings["reload_vqa_s"]
             + (0.0 if coresident else timings["load_vsm_s"]))
    timings["images_per_s_steady"] = n / compute
    timings["images_per_s_amortized"] = n / (compute + swaps)
    timings["swap_total_s"] = swaps
    timings["n_images"] = n
    if log:
        for t in TEST_TYPES:
            if per_type[t]:
                log(f"{t} {np.mean(per_type[t]):.4f}")
        accs = [c for t in TEST_TYPES for c in per_type[t]]
        log(f"overall {np.mean(accs):.4f}")
        log(f"phased: {n} images; phases "
            f"{timings['phase1_s']:.2f}/{timings['phase2_s']:.2f}/"
            f"{timings['phase3_s']:.2f} s ({timings['n_searches']} "
            f"searches); swaps {swaps:.2f} s; "
            f"{timings['images_per_s_steady']:.3f} images/s steady, "
            f"{timings['images_per_s_amortized']:.3f} amortized")
    if output_path:
        with open(output_path, "w") as f:
            json.dump(results, f, indent=4)
    return results, {t: list(v) for t, v in per_type.items()}, timings
