"""Batched V*Bench evaluation — workload 4 (SURVEY.md §2.8): mesh/device
batching over many images' searches.

The per-sample SEAL loop stays semantically identical to eval/seal.py;
what batches is the expensive part — all visual searches of an image
group advance in lockstep waves through `run_batched_searches`, sharing
every 7B weight read across concurrent searches."""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from copy import deepcopy
from typing import Dict, List, Sequence

import numpy as np
from PIL import Image

from ..data.preprocess import expand2square
from ..search.batched import run_grouped_searches
from .seal import focus_prompt, normalize_bbox, parse_missing_objects


def _finish_sample(vqa_engine, image, question, options, missing_objects,
                   search_result, prediction) -> Dict:
    """Focused multiple-choice re-ask (seal_answer's tail)."""
    squared, left, top = expand2square(image)
    if missing_objects:
        names = [r["name"] for r in search_result]
        bboxes = deepcopy([r["bbox"] for r in search_result])
        if len(names) <= 2:
            images_long, objects_long = [False], [True] * len(names)
        else:
            images_long, objects_long = [False], [False] * len(names)
        crops = [vqa_engine.get_object_crop(image, b, 1.2) for b in bboxes]
        bbox_list = []
        for b in bboxes:
            b = [b[0] + left, b[1] + top, b[2], b[3]]
            bbox_list.append(normalize_bbox(b, squared.width,
                                            squared.height))
        q = focus_prompt(question, names, bbox_list)
        chosen = vqa_engine.multiple_choice(squared, q, options, crops,
                                            images_long=images_long,
                                            objects_long=objects_long)
    else:
        chosen = vqa_engine.multiple_choice(squared, question, options)
    return {
        "question": question, "options": list(options),
        "prediction_freeform": prediction,
        "missing_objects": missing_objects,
        "search_result": search_result,
        "option_chosen": int(chosen), "correct": int(chosen == 0),
    }


def run_search_phase(vsm_batched, images: Sequence, missing: Sequence[List[str]],
                     minimum_size_scale=4.0, minimum_size=224,
                     max_search_steps=None, **policy_kw):
    """Run every (image, missing-object) search across the batch in
    lockstep waves. Returns (search_results, failed) per image:
    `search_results[i]` is the seal_answer box list (weak fallback boxes
    included, matching visual_search.py:498-511 + app.py:165-179) and
    `failed[i]` the object names whose search was unsuccessful
    (app.py:166: `if not search_successful`)."""
    tasks = []      # (sample_idx, object_name)
    for i, objs in enumerate(missing):
        for name in objs:
            tasks.append((i, name))
    search_results: List[List[Dict]] = [[] for _ in images]
    failed: List[List[str]] = [[] for _ in images]
    if not tasks:
        return search_results, failed
    search_tasks = [
        {"image": images[i], "name": name,
         "smallest": max(int(np.ceil(min(images[i].width, images[i].height)
                                     / minimum_size_scale)), minimum_size)}
        for i, name in tasks]
    outs = run_grouped_searches(vsm_batched, search_tasks,
                                max_steps=max_search_steps, **policy_kw)
    for (i, name), (final_step, _, ok, all_boxes) in zip(tasks, outs):
        if not ok:
            failed[i].append(name)
        if final_step is None or final_step.detection_result is None:
            continue  # the reference would crash here (VSM never stashed)
        if all_boxes is not None:
            for sb in all_boxes:
                sb = np.asarray(sb, np.float64).copy()
                sb[0] += final_step.bbox[0]
                sb[1] += final_step.bbox[1]
                search_results[i].append({"bbox": sb.tolist(),
                                          "name": name})
        else:
            sb = np.asarray(final_step.detection_result,
                            np.float64).copy()
            sb[0] += final_step.bbox[0]
            sb[1] += final_step.bbox[1]
            search_results[i].append({"bbox": sb.tolist(), "name": name})
    return search_results, failed


def build_focus_inputs(vqa_engine, image, question: str,
                       search_result: Sequence[Dict],
                       failed: Sequence[str] = (),
                       include_failed: bool = False):
    """Focused re-ask inputs for one sample: (squared_image, question,
    crops, images_long, objects_long). Mirrors seal_answer's tail /
    app.py:183-226; `include_failed` adds app.py's failed-objects clause
    (freeform serving path only — the benchmark MC prompt never has it)."""
    squared, left, top = expand2square(image)
    names = [r["name"] for r in search_result]
    bboxes = deepcopy([r["bbox"] for r in search_result])
    if len(names) <= 2:
        il, ol = [False], [True] * len(names)
    else:
        il, ol = [False], [False] * len(names)
    crops = [vqa_engine.get_object_crop(image, b, 1.2) for b in bboxes]
    bbox_list = []
    for b in bboxes:
        b = [b[0] + left, b[1] + top, b[2], b[3]]
        bbox_list.append(normalize_bbox(b, squared.width, squared.height))
    q = focus_prompt(question, names, bbox_list,
                     failed_names=failed if include_failed else ())
    return squared, q, crops, il, ol


def eval_batch(vqa_engine, vsm_batched, samples: Sequence[Dict],
               minimum_size_scale=4.0, minimum_size=224,
               max_search_steps=None) -> List[Dict]:
    """samples: [{'image': PIL, 'question': str, 'options': [...]}]."""
    # Phase 1: free-form answers — one batched device call when the
    # engine supports it (VQAEngine.free_form_many), else sequential.
    squared_imgs = [expand2square(s["image"])[0] for s in samples]
    if hasattr(vqa_engine, "free_form_many"):
        predictions = vqa_engine.free_form_many(
            squared_imgs, [s["question"] for s in samples])
    else:
        predictions = [vqa_engine.free_form(img, s["question"])
                       for img, s in zip(squared_imgs, samples)]
    missing = [parse_missing_objects(p) for p in predictions]

    # Phase 2: ALL searches across the batch advance in lockstep waves.
    search_results, _ = run_search_phase(
        vsm_batched, [s["image"] for s in samples], missing,
        minimum_size_scale, minimum_size, max_search_steps)

    # Phase 3: focused multiple choice — batched when supported.
    if not hasattr(vqa_engine, "multiple_choice_many"):
        return [_finish_sample(vqa_engine, s["image"], s["question"],
                               s["options"], missing[i], search_results[i],
                               predictions[i])
                for i, s in enumerate(samples)]

    mc_imgs, mc_qs, mc_opts, mc_crops, mc_il, mc_ol = [], [], [], [], [], []
    for i, s in enumerate(samples):
        if missing[i]:
            squared, q, crops, il, ol = build_focus_inputs(
                vqa_engine, s["image"], s["question"], search_results[i])
        else:
            squared = expand2square(s["image"])[0]
            il, ol, crops, q = None, None, None, s["question"]
        mc_imgs.append(squared)
        mc_qs.append(q)
        mc_opts.append(list(s["options"]))
        mc_crops.append(crops)
        mc_il.append(il)
        mc_ol.append(ol)
    chosen = vqa_engine.multiple_choice_many(
        mc_imgs, mc_qs, mc_opts, object_crops_list=mc_crops,
        images_long=mc_il, objects_long=mc_ol)
    return [{
        "question": s["question"], "options": list(s["options"]),
        "prediction_freeform": predictions[i],
        "missing_objects": missing[i],
        "search_result": search_results[i],
        "option_chosen": int(chosen[i]), "correct": int(chosen[i] == 0),
    } for i, s in enumerate(samples)]


def eval_model_batched(args, vqa_engine, vsm_batched, image_batch: int = 4):
    """Batched counterpart of eval/vstar_bench.eval_model.

    The NEXT chunk's images decode — and their device canvases upload
    (BatchedVSMEngine.prefetch_canvas) — on a background thread while the
    current chunk's waves run, so per-group canvas uploads amortize to
    ~zero instead of serializing in front of each group's first wave."""
    from concurrent.futures import ThreadPoolExecutor

    def load_chunk(folder, chunk):
        samples = []
        for f in chunk:
            path = os.path.join(folder, f)
            ann = json.load(open(path.rsplit(".", 1)[0] + ".json"))
            samples.append({"image": Image.open(path).convert("RGB"),
                            "question": ann["question"],
                            "options": ann["options"], "file": f})
        prefetch = getattr(vsm_batched, "prefetch_canvas", None)
        if prefetch is not None:
            for s in samples:
                prefetch(s["image"])
        return samples

    results = {}
    per_type = defaultdict(list)
    all_acc = []
    latencies = []
    loader = ThreadPoolExecutor(max_workers=1,
                                thread_name_prefix="chunk-loader")
    for test_type in ["direct_attributes", "relative_position"]:
        results[test_type] = []
        folder = os.path.join(args.benchmark_folder, test_type)
        files = [f for f in sorted(os.listdir(folder)) if ".json" not in f]
        chunks = [files[s:s + image_batch]
                  for s in range(0, len(files), image_batch)]
        pending = loader.submit(load_chunk, folder, chunks[0]) \
            if chunks else None
        for ci, chunk in enumerate(chunks):
            samples = pending.result()
            pending = loader.submit(load_chunk, folder, chunks[ci + 1]) \
                if ci + 1 < len(chunks) else None
            t0 = time.perf_counter()
            recs = eval_batch(vqa_engine, vsm_batched, samples,
                              args.minimum_size_scale, args.minimum_size)
            dt = (time.perf_counter() - t0) / len(samples)
            for s, rec in zip(samples, recs):
                rec["image"] = s["file"]
                per_type[test_type].append(rec["correct"])
                all_acc.append(rec["correct"])
                latencies.append(dt)
                results[test_type].append(rec)
        if per_type[test_type]:
            print(test_type, np.mean(per_type[test_type]))
    if all_acc:
        print(np.mean(all_acc))
        print(f"throughput: {1.0 / np.mean(latencies):.3f} images/s")
    with open(args.output_path, "w") as f:
        json.dump(results, f, indent=4)
    return results
