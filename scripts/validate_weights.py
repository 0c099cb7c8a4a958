"""One-command validation for REAL seal checkpoints, the day they arrive.

Given HF-format checkpoint directories for seal_vqa_7b and/or seal_vsm_7b:
  1. strict key audit of each state dict through the actual importers
     (every present key consumed or skippable-by-design; nothing missing);
  2. load both engines (shapes from the checkpoint's config.json);
  3. smoke the full inference surfaces on a synthetic image: VQA free-form
     + multiple-choice, VSM detect/vqa/segment, and one guided search;
  4. optionally run the real V*Bench eval (--benchmark-folder).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_weights.py \
         --vqa-model-path <dir> --vsm-model-path <dir>

Exit code 0 = importable and live on this backend. Accuracy still needs
the benchmark folder (step 4) — parity targets in BASELINE.md.
"""

import argparse
import sys

import numpy as np
from PIL import Image


def synthetic_image(w=640, h=480):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (h, w, 3), np.uint8)
    arr[200:260, 300:380] = (250, 30, 30)  # a "red thing" to find
    return Image.fromarray(arr)


def audit(model_dir: str, which: str) -> bool:
    from vstar_tpu.core.checkpoint import load_torch_dir
    from vstar_tpu.core.hf_config import vqa_llm_config_for, vsm_config_for
    from vstar_tpu.core.import_audit import audit_import

    sd = load_torch_dir(model_dir)
    if which == "vqa":
        from vstar_tpu.models.vqa_llm import vqa_llm_params_from_torch
        cfg = vqa_llm_config_for(model_dir)
        aud = audit_import(sd, lambda s: vqa_llm_params_from_torch(s, cfg))
    else:
        from vstar_tpu.models.vsm import vsm_params_from_torch
        cfg = vsm_config_for(model_dir)
        aud = audit_import(sd, lambda s: vsm_params_from_torch(s, cfg))
    print(f"[{which}] key audit: {aud.summary()}")
    if aud.unknown:
        print(f"[{which}] UNKNOWN keys: {aud.unknown[:20]}")
    if aud.missing:
        print(f"[{which}] MISSING keys: {aud.missing[:20]}")
    if (aud.aborted or aud.missing) and cfg.llama.num_layers == 32:
        # the importer stops at its first missing key; the committed 7B
        # manifest gives the COMPLETE missing/unknown lists
        from vstar_tpu.core.import_audit import audit_key_list
        man = audit_key_list(sd.keys(), f"seal_{which}_7b")
        print(f"[{which}] manifest audit: {man.summary()}")
        if man.missing:
            print(f"[{which}] manifest MISSING: {man.missing[:40]}")
        if man.unknown:
            print(f"[{which}] manifest UNKNOWN: {man.unknown[:40]}")
    return not (aud.unknown or aud.missing)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vqa-model-path")
    p.add_argument("--vsm-model-path")
    p.add_argument("--benchmark-folder",
                   help="optional: also run the real V*Bench eval")
    p.add_argument("--skip-audit", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="flag-matrix sweep: measure accuracy/latency for "
                        "every opt-in (int8 KV, W8A8, prompt-lookup, "
                        "compiled search) in one run — the day-one gate "
                        "table (eval/flag_matrix.py); add "
                        "--benchmark-folder for real V*Bench accuracy "
                        "per cell")
    p.add_argument("--runner-sweep", action="store_true",
                   help="residency-mode sweep (needs --benchmark-folder "
                        "and both model paths): phased swap (base), "
                        "parked host-RAM swap, int4 co-resident and "
                        "mixed int8-VQA/int4-VSM co-resident — one row "
                        "per mode with throughput, swap cost, accuracy "
                        "and records_match_base "
                        "(eval/flag_matrix.run_runner_matrix)")
    p.add_argument("--int8", dest="int8", action="store_true",
                   default=None,
                   help="force weight-only int8 even on mesh/CPU runs")
    p.add_argument("--no-int8", dest="int8", action="store_false",
                   default=None,
                   help="validate bf16 decoder numerics (needs the HBM "
                        "for it: mesh-shard or a >16 GB chip); default "
                        "is the single-chip serving config (int8)")
    args = p.parse_args()
    if not (args.vqa_model_path or args.vsm_model_path):
        p.error("need --vqa-model-path and/or --vsm-model-path")

    ok = True
    if not args.skip_audit:
        if args.vqa_model_path:
            ok &= audit(args.vqa_model_path, "vqa")
        if args.vsm_model_path:
            ok &= audit(args.vsm_model_path, "vsm")
        if not ok:
            print("KEY AUDIT FAILED — fix the import schema before "
                  "trusting any numbers below.")

    img = synthetic_image()

    vqa = vsm = None
    from vstar_tpu.eval.vstar_bench import load_vqa_engine, load_vsm_engine
    if args.vqa_model_path:
        vqa = load_vqa_engine(args.vqa_model_path, int8=args.int8)
        ans = vqa.free_form(img, "What is in this image?")
        print(f"[vqa] free_form: {ans!r}")
        opt = vqa.multiple_choice(
            img, "What color is the rectangle?",
            ["(A) red", "(B) blue", "(C) green", "(D) yellow"])
        print(f"[vqa] multiple_choice -> option {opt}")
        # real-weight speculation acceptance (tok/forward; >1.3 or so
        # and the opt-in is worth flipping on — see BASELINE.md envelope)
        vqa.prompt_lookup = True
        ans2 = vqa.free_form(img, "What is in this image?")
        assert ans2 == ans, "prompt-lookup must be greedy-equivalent"
        acc = vqa.last_decode_stats
        if acc is not None:
            print(f"[vqa] prompt-lookup acceptance: "
                  f"{acc['tokens_per_forward']:.2f} tok/forward over "
                  f"{acc['tokens']} tokens (greedy = 1.0)")
        vqa.prompt_lookup = False
    if args.vsm_model_path:
        vsm = load_vsm_engine(args.vsm_model_path, int8=args.int8)
        boxes, logits, heat = vsm.detect(img, "red rectangle")
        top = float(logits.max()) if logits.size else float("nan")
        print(f"[vsm] detect: {len(boxes)} candidates, top sigmoid "
              f"{top:.3f}, heatmap max {float(heat.max()):.2f}")
        txt = vsm.vqa(img, "According to the common sense knowledge, "
                           "where is the red rectangle most likely to "
                           "appear in this image?")
        print(f"[vsm] vqa: {txt!r}")
        from vstar_tpu.search.policy import visual_search
        step, n, found, bboxes = visual_search(vsm, img, "red rectangle")
        print(f"[search] found={found} path_len={n} "
              f"bbox={None if step is None else step.bbox}")
        # the compiled whole-search-on-device form must agree on the
        # accept/fallback verdict (resampler-level pixel differences are
        # expected; see PARITY.md deviations). Params are SHARED with the
        # loaded engine — no second copy of the 7B weights.
        from vstar_tpu.search.batched import BatchedVSMEngine
        from vstar_tpu.search.compiled import CompiledVSMSearch
        vsm_dp = BatchedVSMEngine(
            vsm.params, vsm.cfg, vsm.tokenizer,
            loc_token_id=vsm.loc_token_id, eos_id=vsm.eos_id,
            max_new_tokens=vsm.max_new_tokens,
            prompt_buckets=vsm.prompt_buckets,
            compute_dtype=vsm.compute_dtype, device_preprocess=True)
        cstep, cn, cfound, _ = CompiledVSMSearch(vsm_dp).search(
            img, "red rectangle")
        print(f"[search/compiled] found={cfound} path_len={cn} "
              f"bbox={None if cstep is None else cstep.bbox}")
        # vsm_dp shares vsm.params; drop its reference (and canvas
        # cache) so freeing vsm later actually releases the HBM
        vsm_dp.params = None
        vsm_dp._canvas_cache.clear()
        del vsm_dp

    if args.sweep and vqa is not None and vsm is not None:
        # one command -> the whole opt-in gate table (needs both 7B
        # models resident: two chips / a mesh / a >32 GB host)
        import json

        from vstar_tpu.eval.flag_matrix import (format_table,
                                                run_flag_matrix)
        from vstar_tpu.eval.vqa_engine import VQAEngine
        from vstar_tpu.search.batched import BatchedVSMEngine

        def make_engines(kv_int8, prompt_lookup, compiled, int4=False):
            if int4:
                # int4 is a different host-side quantization of the
                # checkpoint: reload from disk (one command, day-one)
                from vstar_tpu.eval.vstar_bench import (load_vqa_engine,
                                                        load_vsm_engine)
                vq = load_vqa_engine(args.vqa_model_path, int4=True,
                                     kv_int8=kv_int8,
                                     prompt_lookup=prompt_lookup)
                vs = load_vsm_engine(args.vsm_model_path, int4=True,
                                     kv_int8=kv_int8,
                                     device_preprocess=compiled)
            else:
                vq = VQAEngine(vqa.params, vqa.cfg, vqa.tokenizer,
                               conv_type=vqa.conv_type,
                               prompt_buckets=vqa.prompt_buckets,
                               kv_int8=kv_int8, prompt_lookup=prompt_lookup)
                vs = BatchedVSMEngine(
                    vsm.params, vsm.cfg, vsm.tokenizer,
                    loc_token_id=vsm.loc_token_id, eos_id=vsm.eos_id,
                    max_new_tokens=vsm.max_new_tokens,
                    prompt_buckets=vsm.prompt_buckets,
                    compute_dtype=vsm.compute_dtype, kv_int8=kv_int8,
                    device_preprocess=compiled)
            if compiled:
                from vstar_tpu.search.compiled import CompiledVSMSearch
                vs = CompiledVSMSearch(vs)
            return vq, vs

        rows = run_flag_matrix(make_engines, img,
                               search_name="red rectangle",
                               benchmark_folder=args.benchmark_folder)
        print(format_table(rows))
        with open("flag_matrix.json", "w") as f:
            json.dump(rows, f, indent=2)
        print("flag matrix -> flag_matrix.json")
    if args.runner_sweep:
        if not (args.benchmark_folder and args.vqa_model_path
                and args.vsm_model_path):
            sys.exit("--runner-sweep needs --benchmark-folder and both "
                     "model paths")
        import json

        from vstar_tpu.eval.flag_matrix import run_runner_matrix
        from vstar_tpu.eval.phased import free_engine
        from vstar_tpu.eval.vstar_bench import (load_vqa_engine,
                                                load_vsm_engine)

        # drop the smoke-check pair before the sweep: its ~15 GB of int8
        # weights would leave the residency cells no chip to measure
        # (vsm_dp shares vsm.params — freeing vsm covers it)
        if vqa is not None:
            free_engine(vqa)
        if vsm is not None:
            free_engine(vsm)
        vqa = vsm = None

        # zero-arg factories re-reading the checkpoint: exactly what a
        # production phase swap pays (the parked cell then measures the
        # host-RAM alternative against it)
        def vqa_f():
            return load_vqa_engine(args.vqa_model_path)

        def vsm_f():
            return load_vsm_engine(args.vsm_model_path,
                                   device_preprocess=True)

        def vqa4_f():
            return load_vqa_engine(args.vqa_model_path, int4=True)

        def vsm4_f():
            return load_vsm_engine(args.vsm_model_path, int4=True,
                                   device_preprocess=True)

        def vsm4mix_f():
            return load_vsm_engine(args.vsm_model_path, int4="int4mix",
                                   device_preprocess=True)

        runner_rows = run_runner_matrix(
            args.benchmark_folder, vqa_f, vsm_f,
            coresident_factories=(vqa4_f, vsm4_f),
            # mixed: int8 VQA (the dominant free-form/MC phases decode at
            # int8 speed) + int4 VSM (searches pay int4) — the
            # single-chip serving candidate (VERDICT r4 #1)
            mixed_factories=(vqa_f, vsm4_f),
            # int4mix VSM: per-matrix int4/int8 (1.30x faster search
            # decode, +1.8 GB) — runs at its own B<=2 operating point
            int4mix_factories=(vqa_f, vsm4mix_f))
        with open("runner_matrix.json", "w") as f:
            json.dump(runner_rows, f, indent=2)
        print("runner matrix -> runner_matrix.json")
    elif args.benchmark_folder and vqa is not None and vsm is not None \
            and not args.sweep:
        from vstar_tpu.eval.vstar_bench import eval_model
        ns = argparse.Namespace(
            vqa_model_path=args.vqa_model_path,
            vsm_model_path=args.vsm_model_path, conv_type="v1",
            benchmark_folder=args.benchmark_folder,
            output_path="eval_result.json", minimum_size_scale=4.0,
            minimum_size=224, image_batch=1)
        eval_model(ns, vqa, vsm)

    print("VALIDATION", "PASSED" if ok else "FAILED (see audit)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
