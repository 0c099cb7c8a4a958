"""V*Bench evaluator CLI — the framework's equivalent of
/root/reference/vstar_bench_eval.py.

Usage:
  python -m vstar_tpu.eval.vstar_bench \\
      --vqa-model-path <hf dir> --vsm-model-path <hf dir> \\
      --benchmark-folder vstar_bench --output-path eval_result.json

Walks direct_attributes/ and relative_position/, runs the SEAL loop per
sample, prints per-subtask and overall accuracy, and dumps the result JSON
in the reference schema.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from collections import defaultdict

import numpy as np
from PIL import Image

from .seal import seal_answer


def _auto_int8(int8, mesh) -> bool:
    """Default weight-only int8 for the 7B decoders on a single TPU chip:
    the bf16 pair (~27 GB) cannot fit one 16 GB v5e. Sharded (mesh) or
    CPU runs keep bf16 unless int8 is requested explicitly."""
    if int8 is not None:
        return int8
    import jax
    return jax.devices()[0].platform == "tpu" and mesh is None


def load_vqa_engine(vqa_model_path: str, conv_type: str = "v1", mesh=None,
                    int8=None, device=None, kv_int8: bool = False,
                    prompt_lookup: bool = False, int4: bool = False):
    """Load the VQA LLM from an HF-format checkpoint directory. Model
    shape follows the checkpoint's config.json (any Vicuna size / tower),
    like the reference's from_pretrained path (builder.py:26-151).
    int4: group-128 int4 decoder weights (Pallas fused-dequant kernel;
    halves decode weight reads AND lets the SEAL pair share one chip —
    accuracy opt-in like W8A8); towers stay int8. Pass the string
    'int4mix' for the per-matrix int4/int8 split (nn/quant
    .INT4MIX_INT4_KEYS: 1.30x faster decode than int4 for +1.8 GB)."""
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from ..core.checkpoint import load_torch_dir
    from ..core.hf_config import vqa_llm_config_for
    from ..models.vqa_llm import vqa_llm_params_from_torch
    from .vqa_engine import VQAEngine

    vqa_cfg = vqa_llm_config_for(vqa_model_path)
    vqa_tok = AutoTokenizer.from_pretrained(vqa_model_path, use_fast=False)
    vqa_sd = load_torch_dir(vqa_model_path)
    use_int8 = _auto_int8(int8, mesh)
    vqa_params = vqa_llm_params_from_torch(
        vqa_sd, vqa_cfg, dtype=jnp.bfloat16,
        quantize_llm=(int4 if isinstance(int4, str) else "int4")
        if int4 else use_int8)
    if use_int8 or int4:
        from ..nn.quant import quantize_model_towers
        vqa_params = quantize_model_towers(vqa_params)
    if device is not None:   # per-model chip placement (see load_engines)
        import jax
        vqa_params = jax.device_put(vqa_params, device)
    return VQAEngine(vqa_params, vqa_cfg, vqa_tok, conv_type=conv_type,
                     mesh=mesh, kv_int8=kv_int8, prompt_lookup=prompt_lookup)


def load_vsm_engine(vsm_model_path: str, device_preprocess: bool = False,
                    mesh=None, int8=None, device=None,
                    kv_int8: bool = False, int4: bool = False):
    """Load the VSM from an HF-format checkpoint directory (the
    search-mechanism eval needs only this half, visual_search.py:142).
    device_preprocess opts the batched search path into on-device patch
    extraction (throughput mode; host PIL stays the exact-parity
    default)."""
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from ..core.checkpoint import load_torch_dir
    from ..core.hf_config import vsm_config_for
    from ..models.vsm import vsm_params_from_torch
    from ..search.batched import BatchedVSMEngine as VSMEngine

    vsm_cfg = vsm_config_for(vsm_model_path)
    vsm_tok = AutoTokenizer.from_pretrained(vsm_model_path, use_fast=False)
    loc_id = vsm_tok("[LOC]", add_special_tokens=False).input_ids[0]
    vsm_sd = load_torch_dir(vsm_model_path)
    use_int8 = _auto_int8(int8, mesh)
    vsm_params = vsm_params_from_torch(
        vsm_sd, vsm_cfg, dtype=jnp.bfloat16,
        quantize_llm=(int4 if isinstance(int4, str) else "int4")
        if int4 else use_int8)
    if use_int8 or int4:
        from ..nn.quant import quantize_model_towers
        vsm_params = quantize_model_towers(vsm_params)
    if device is not None:
        import jax
        vsm_params = jax.device_put(vsm_params, device)
    return VSMEngine(vsm_params, vsm_cfg, vsm_tok, loc_token_id=loc_id,
                     device_preprocess=device_preprocess, mesh=mesh,
                     kv_int8=kv_int8)


def load_engines(vqa_model_path: str, vsm_model_path: str,
                 conv_type: str = "v1", mesh=None, int8=None,
                 device_preprocess: bool = False, split_models=None,
                 kv_int8: bool = False, prompt_lookup: bool = False,
                 int4: bool = False):
    """Load both models from HF-format checkpoint directories. mesh:
    optional jax.sharding.Mesh (or 'DxFxM' string) to shard both models
    over for multi-chip serving. int8: None = auto (weight-only int8 on
    a single TPU chip, bf16 otherwise), True/False = force.

    split_models: place the VQA LLM on chip 0 and the VSM on chip 1
    (None = auto when >= 2 un-meshed TPU chips exist). The int8 7B PAIR
    is ~15 GB of weights — it does NOT fit one 16 GB v5e together with
    activations/KV (measured), so a single chip can serve ONE model;
    the pair needs two chips (this split), a sharding mesh, phase
    swapping (--single-chip-phased), or int4=True (~8 GB pair: both
    models resident on ONE chip; measured r4, accuracy opt-in)."""
    import jax

    mesh = resolve_mesh(mesh)
    devs = jax.devices()
    if split_models is None:
        split_models = (mesh is None and len(devs) >= 2
                        and devs[0].platform == "tpu")
    d_vqa = devs[0] if split_models else None
    d_vsm = devs[1] if split_models else None
    return (load_vqa_engine(vqa_model_path, conv_type, mesh=mesh,
                            int8=int8, device=d_vqa, kv_int8=kv_int8,
                            prompt_lookup=prompt_lookup, int4=int4),
            load_vsm_engine(vsm_model_path, mesh=mesh, int8=int8,
                            device_preprocess=device_preprocess,
                            device=d_vsm, kv_int8=kv_int8, int4=int4))


def resolve_mesh(mesh):
    """None | 'DxFxM' string | Mesh -> None | Mesh."""
    if mesh is None or not isinstance(mesh, str):
        return mesh
    import jax

    from ..core.memory import parse_mesh_arg
    from ..core.mesh import make_mesh
    return make_mesh(parse_mesh_arg(mesh, len(jax.devices())))


def eval_model(args, vqa_engine=None, vsm_engine=None):
    if getattr(args, "compile_cache", None):
        from ..core.compile_cache import enable_compile_cache
        enable_compile_cache(args.compile_cache)
    if getattr(args, "single_chip_phased", False):
        # ONE model resident at a time: free-form over all images, one
        # swap to the VSM, all searches, swap back, all focus re-asks
        # (eval/phased.py; the 7B pair does not fit one 16 GB chip)
        from .phased import eval_model_phased
        assert vqa_engine is None and vsm_engine is None, \
            "--single-chip-phased builds its own engines per phase"
        assert getattr(args, "mesh", None) is None, \
            "--single-chip-phased is the single-chip mode; use --mesh " \
            "OR phased, not both"
        compiled = getattr(args, "compiled", False)

        # --mixed (r5): int8 VQA decoder + int4 VSM co-residency — the
        # measured-best single-chip pair split (0.796 vs 0.698 images/s
        # all-int4, same session; the reverse split OOMs at B=8 — the
        # VSM's extra towers push the int8 side past 16 GB).
        # --int4mix upgrades the int4 side to the per-matrix int4/int8
        # split (alone it implies --mixed — its intended pairing)
        int4mix = getattr(args, "int4mix", False)
        mixed = getattr(args, "mixed", False) or (
            int4mix and not getattr(args, "int4", False))
        int4mode = "int4mix" if int4mix else True

        def vqa_factory():
            return load_vqa_engine(
                args.vqa_model_path, args.conv_type,
                int8=True if mixed else getattr(args, "int8", None),
                kv_int8=getattr(args, "kv_int8", False),
                prompt_lookup=getattr(args, "prompt_lookup", False),
                int4=int4mode if (getattr(args, "int4", False)
                                  and not mixed) else False)

        def vsm_factory():
            eng = load_vsm_engine(
                args.vsm_model_path,
                device_preprocess=getattr(args, "device_preprocess",
                                          False) or compiled,
                int8=getattr(args, "int8", None),
                kv_int8=getattr(args, "kv_int8", False),
                int4=int4mode if (getattr(args, "int4", False)
                                  or mixed) else False)
            if compiled:
                from ..search.compiled import CompiledVSMSearch
                return CompiledVSMSearch(eng)
            return eng

        results, per_type, timings = eval_model_phased(
            args.benchmark_folder, vqa_factory, vsm_factory,
            output_path=args.output_path,
            minimum_size_scale=args.minimum_size_scale,
            minimum_size=args.minimum_size,
            # explicit --image-batch is honored (HBM-pressure mitigation
            # must not be silently overridden); unset defaults to the
            # measured single-chip wave size
            batch=getattr(args, "image_batch", None) or 8,
            coresident=getattr(args, "coresident", False))
        return results, per_type, timings
    if vqa_engine is None:
        compiled = getattr(args, "compiled", False)
        vqa_engine, vsm_engine = load_engines(
            args.vqa_model_path, args.vsm_model_path, args.conv_type,
            mesh=getattr(args, "mesh", None),
            int8=getattr(args, "int8", None),
            device_preprocess=getattr(args, "device_preprocess", False)
            or compiled,
            kv_int8=getattr(args, "kv_int8", False),
            prompt_lookup=getattr(args, "prompt_lookup", False),
            int4=("int4mix" if getattr(args, "int4mix", False) else True)
            if (getattr(args, "int4", False)
                or getattr(args, "int4mix", False)) else False)
        if compiled:
            from ..search.compiled import CompiledVSMSearch
            vsm_engine = CompiledVSMSearch(vsm_engine)
    if (getattr(args, "image_batch", None) or 1) > 1:
        # workload 4: batched lockstep searches (eval/batched_bench.py)
        from .batched_bench import eval_model_batched
        return eval_model_batched(args, vqa_engine, vsm_engine,
                                  image_batch=args.image_batch), None, None
    results = {}
    per_type_acc = defaultdict(list)
    all_acc = []
    latencies = []

    for test_type in ["direct_attributes", "relative_position"]:
        results[test_type] = []
        folder = os.path.join(args.benchmark_folder, test_type)
        image_files = [f for f in sorted(os.listdir(folder))
                       if ".json" not in f]
        for image_file in image_files:
            image_path = os.path.join(folder, image_file)
            annotation = json.load(
                open(image_path.rsplit(".", 1)[0] + ".json"))
            image = Image.open(image_path).convert("RGB")
            t0 = time.perf_counter()
            record = seal_answer(
                vqa_engine, vsm_engine, image, annotation["question"],
                annotation["options"],
                minimum_size_scale=args.minimum_size_scale,
                minimum_size=args.minimum_size)
            latencies.append(time.perf_counter() - t0)
            record["image"] = image_file
            per_type_acc[test_type].append(record["correct"])
            all_acc.append(record["correct"])
            results[test_type].append(record)
        if per_type_acc[test_type]:
            print(test_type, np.mean(per_type_acc[test_type]))

    if all_acc:
        print(np.mean(all_acc))
        print(f"p50 latency: {np.percentile(latencies, 50):.3f}s  "
              f"throughput: {1.0 / np.mean(latencies):.3f} images/s")

    with open(args.output_path, "w") as f:
        json.dump(results, f, indent=4)
    return results, dict(per_type_acc), latencies


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="V*Bench SEAL evaluation")
    p.add_argument("--vqa-model-path", type=str,
                   default="craigwu/seal_vqa_7b")
    p.add_argument("--vsm-model-path", type=str,
                   default="craigwu/seal_vsm_7b")
    p.add_argument("--conv_type", default="v1", type=str)
    p.add_argument("--benchmark-folder", type=str, default="vstar_bench")
    p.add_argument("--output-path", type=str, default="eval_result.json")
    p.add_argument("--minimum_size_scale", default=4.0, type=float)
    p.add_argument("--minimum_size", default=224, type=int)
    p.add_argument("--mesh", default=None,
                   help="DxFxM device mesh to shard both 7B models over "
                        "(multi-chip serving), e.g. 1x4x1")
    p.add_argument("--int8", dest="int8", action="store_true",
                   default=None,
                   help="force weight-only int8 even on mesh/CPU runs")
    p.add_argument("--no-int8", dest="int8", action="store_false",
                   default=None,
                   help="keep bf16 decoder weights (default: int8 on a "
                        "single TPU chip)")
    p.add_argument("--device-preprocess", action="store_true",
                   default=False,
                   help="extract search patches on device (one canvas "
                        "upload per image; throughput mode)")
    p.add_argument("--image-batch", dest="image_batch", default=None,
                   type=int,
                   help=">1 runs all searches of an image group as one "
                        "lockstep device batch (requires a batched VSM "
                        "engine); with --single-chip-phased it sets the "
                        "phase wave size (default 8, the measured "
                        "single-chip operating point — an explicit "
                        "smaller value is honored, e.g. under HBM "
                        "pressure)")
    p.add_argument("--compiled", action="store_true", default=False,
                   help="whole-search-on-device: each guided search runs "
                        "as ONE fused device program (implies "
                        "--device-preprocess; serial searches)")
    p.add_argument("--kv-int8", dest="kv_int8", action="store_true",
                   default=False,
                   help="int8 KV cache (halves residency + decode KV "
                        "reads; 1.2x no-search throughput measured — "
                        "accuracy unvalidated on real weights)")
    p.add_argument("--int4", dest="int4", action="store_true",
                   default=False,
                   help="group-128 int4 decoder weights via the Pallas "
                        "fused-dequant kernel: halves decode weight reads "
                        "AND fits the 7B SEAL pair on one 16 GB chip "
                        "(accuracy opt-in, like --kv-int8/W8A8)")
    p.add_argument("--int4mix", dest="int4mix", action="store_true",
                   default=False,
                   help="per-matrix int4/int8 decoder on the int4 side "
                        "(nn/quant.INT4MIX_INT4_KEYS: int8 qkvo+down, "
                        "int4 gate/up+lm_head) — 1.30x faster decode "
                        "than --int4 for +1.8 GB; alone it implies "
                        "--mixed, and the bigger pair needs B<=4 waves "
                        "(hbm_probe r5)")
    p.add_argument("--prompt-lookup", dest="prompt_lookup",
                   action="store_true", default=False,
                   help="prompt-lookup speculative decoding for the "
                        "free-form phase (greedy-equivalent; speedup "
                        "depends on how much answers echo the prompt)")
    p.add_argument("--single-chip-phased", dest="single_chip_phased",
                   action="store_true", default=False,
                   help="phase-swapped weight residency: run the whole "
                        "benchmark with ONE 7B model resident at a time "
                        "(free-form -> swap -> searches -> swap -> focus "
                        "re-ask); with --coresident/--int4 the swaps "
                        "disappear (the int4 pair fits together)")
    p.add_argument("--coresident", action="store_true", default=False,
                   help="with --single-chip-phased: build both engines "
                        "up front and skip the swaps — needs the pair to "
                        "fit one chip (--int4; ~9 GB of weights, r4)")
    p.add_argument("--mixed", action="store_true", default=False,
                   help="with --coresident: mixed-precision pair — int8 "
                        "VQA decoder (free-form/MC at int8 speed) + int4 "
                        "VSM (only searches pay the int4 kernels), int8 "
                        "towers; ~12 GB resident, measured +14%% over "
                        "the all-int4 pair (r5)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache (reused across "
                        "runs; see core/compile_cache.py)")
    return p


if __name__ == "__main__":
    eval_model(build_parser().parse_args())
