"""Standalone visual-search evaluation — equivalent of the reference
`visual_search.py main` (visual_search.py:520-564): top-1 localization
accuracy (IoU > 0.5) and average successful path length over V*Bench
annotations."""

from __future__ import annotations

import argparse
import functools
import json
import os

import numpy as np
from PIL import Image

from ..search.policy import iou_xywh


def _collect_tasks(benchmark_folder: str, minimum_size_scale: float,
                   minimum_size: int, visualization: bool,
                   output_path: str):
    tasks = []
    for test_type in ["direct_attributes", "relative_position"]:
        folder = os.path.join(benchmark_folder, test_type)
        image_files = [f for f in sorted(os.listdir(folder))
                       if ".json" not in f]
        for image_file in image_files:
            image_path = os.path.join(folder, image_file)
            ann = json.load(open(image_path.rsplit(".", 1)[0] + ".json"))
            # size from the header only; decode lazily at dispatch so the
            # whole benchmark's pixels are never resident at once
            with Image.open(image_path) as im:
                width, height = im.size
            smallest = max(int(np.ceil(min(width, height)
                                       / minimum_size_scale)), minimum_size)
            for i, (gt_bbox, name) in enumerate(zip(ann["bbox"],
                                                    ann["target_object"])):
                vis_path = None
                if visualization:
                    vis_path = os.path.join(
                        output_path, test_type,
                        f"{image_file.rsplit('.', 1)[0]}_{i}")
                tasks.append({"image": functools.partial(_open_rgb,
                                                         image_path),
                              "name": name,
                              "gt_bbox": gt_bbox, "smallest": smallest,
                              "vis_path": vis_path})
    return tasks


def _open_rgb(path: str):
    return Image.open(path).convert("RGB")


def evaluate_search(vsm_engine, benchmark_folder: str,
                    minimum_size_scale: float = 4.0,
                    minimum_size: int = 224,
                    confidence_high: float = 0.5,
                    confidence_low: float = 0.3,
                    target_cue_threshold: float = 6.0,
                    target_cue_threshold_decay: float = 0.7,
                    target_cue_threshold_minimum: float = 3.0,
                    visualization: bool = False, output_path: str = "",
                    image_batch: int = 1):
    """image_batch > 1 runs that many searches concurrently in lockstep
    device waves (run_batched_searches; requires a batched VSM engine) —
    per-task policy parameters and results stay identical to serial."""
    policy_kw = dict(
        confidence_high=confidence_high, confidence_low=confidence_low,
        target_cue_threshold=target_cue_threshold,
        target_cue_threshold_decay=target_cue_threshold_decay,
        target_cue_threshold_minimum=target_cue_threshold_minimum)
    tasks = _collect_tasks(benchmark_folder, minimum_size_scale,
                           minimum_size, visualization, output_path)
    from ..search.batched import run_grouped_searches
    outs = run_grouped_searches(vsm_engine, tasks, image_batch=image_batch,
                                visualize=visualization, **policy_kw)

    acc_list = []
    path_lengths = []
    for t, (final_step, plen, ok, _) in zip(tasks, outs):
        if ok:
            sb = np.asarray(final_step.detection_result,
                            np.float64).copy()
            sb[0] += final_step.bbox[0]
            sb[1] += final_step.bbox[1]
            acc_list.append(1.0 if iou_xywh(sb, t["gt_bbox"]) > 0.5
                            else 0.0)
            path_lengths.append(plen)
        else:
            acc_list.append(0.0)
            path_lengths.append(0)
    ok_lengths = [path_lengths[i] for i in range(len(path_lengths))
                  if acc_list[i]]
    avg_len = float(np.mean(ok_lengths)) if ok_lengths else 0.0
    top1 = float(np.mean(acc_list)) if acc_list else 0.0
    print("Avg search path length:", avg_len)
    print("Top 1 Acc:", top1)
    return top1, avg_len


def main():
    p = argparse.ArgumentParser(description="Visual Search Evaluation")
    p.add_argument("--version", default="craigwu/seal_vsm_7b")
    p.add_argument("--benchmark-folder", default="vstar_bench", type=str)
    p.add_argument("--confidence_low", default=0.3, type=float)
    p.add_argument("--confidence_high", default=0.5, type=float)
    p.add_argument("--target_cue_threshold", default=6.0, type=float)
    p.add_argument("--target_cue_threshold_decay", default=0.7, type=float)
    p.add_argument("--target_cue_threshold_minimum", default=3.0, type=float)
    p.add_argument("--minimum_size_scale", default=4.0, type=float)
    p.add_argument("--minimum_size", default=224, type=int)
    p.add_argument("--visualization", action="store_true", default=False)
    p.add_argument("--output_path", default="", type=str)
    p.add_argument("--image-batch", default=1, type=int,
                   help=">1: run this many searches concurrently as "
                        "lockstep device batches (identical results)")
    p.add_argument("--device-preprocess", action="store_true",
                   default=False,
                   help="extract search patches on device (upload each "
                        "image once; throughput mode — resampler differs "
                        "slightly from the PIL-exact default)")
    p.add_argument("--compiled", action="store_true", default=False,
                   help="whole-search-on-device mode: each search runs "
                        "as ONE fused device program (implies "
                        "--device-preprocess; no --visualization)")
    p.add_argument("--kv-int8", dest="kv_int8", action="store_true",
                   default=False,
                   help="int8 KV cache (halves residency + decode KV "
                        "reads; accuracy unvalidated on real weights)")
    p.add_argument("--int4", dest="int4", action="store_true",
                   default=False,
                   help="group-128 int4 decoder weights (Pallas "
                        "fused-dequant kernel; accuracy opt-in)")
    p.add_argument("--mesh", default=None,
                   help="DxFxM device mesh to shard the VSM over "
                        "(multi-chip), e.g. 1x4x1")
    p.add_argument("--int8", dest="int8", action="store_true",
                   default=None,
                   help="force weight-only int8 even on mesh/CPU runs")
    p.add_argument("--no-int8", dest="int8", action="store_false",
                   default=None,
                   help="keep bf16 decoder weights (default: int8 on a "
                        "single TPU chip)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache (reused across "
                        "runs; see core/compile_cache.py)")
    args = p.parse_args()
    if args.compile_cache:
        from ..core.compile_cache import enable_compile_cache
        enable_compile_cache(args.compile_cache)

    from .vstar_bench import load_vsm_engine, resolve_mesh
    vsm = load_vsm_engine(
        args.version,
        device_preprocess=args.device_preprocess or args.compiled,
        mesh=resolve_mesh(args.mesh), int8=args.int8,
        kv_int8=args.kv_int8, int4=args.int4)
    if args.compiled:
        from ..search.compiled import CompiledVSMSearch
        vsm = CompiledVSMSearch(vsm)
    evaluate_search(vsm, args.benchmark_folder,
                    minimum_size_scale=args.minimum_size_scale,
                    minimum_size=args.minimum_size,
                    confidence_high=args.confidence_high,
                    confidence_low=args.confidence_low,
                    target_cue_threshold=args.target_cue_threshold,
                    target_cue_threshold_decay=args.target_cue_threshold_decay,
                    target_cue_threshold_minimum=args
                    .target_cue_threshold_minimum,
                    visualization=args.visualization,
                    output_path=args.output_path,
                    image_batch=args.image_batch)


if __name__ == "__main__":
    main()
