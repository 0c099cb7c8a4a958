"""HBM accounting for the SEAL phase programs at B=4 vs B=8.

The relay device exposes no runtime memory_stats(), so this probes the
COMPILED executables instead: XLA's memory_analysis reports each
program's argument/output/temp sizes, which together with the live
weight arrays bound the phase's HBM demand — the measured way to settle
whether the r3 "B=8 combined-opt-in dip" was memory pressure or relay
variance (VERDICT r3 next #5; near-full HBM degrades SILENTLY here).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hbm_probe.py \
        [--kv-int8] [--prompt-lookup]
"""
import argparse

import numpy as np
from PIL import Image
import jax, jax.numpy as jnp
from vstar_tpu.core.config import vqa_llm_7b
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params

from bench_common import Tok  # noqa: E402

GB = 1024 ** 3


def live_gb() -> float:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.live_arrays()) / GB


def analyze(jitted, a, k):
    try:
        m = jitted.lower(*a, **k).compile().memory_analysis()
        if m is None:
            return None
        return {n.split("_size_in_bytes")[0]: round(
                    getattr(m, n) / GB, 3)
                for n in ("argument_size_in_bytes",
                          "output_size_in_bytes",
                          "temp_size_in_bytes",
                          "alias_size_in_bytes")
                if hasattr(m, n)}
    except Exception as e:  # pragma: no cover - backend-dependent
        return {"unavailable": type(e).__name__}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-int8", action="store_true", default=False)
    ap.add_argument("--prompt-lookup", action="store_true", default=False)
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8],
                    help="wave sizes to analyze")
    ap.add_argument("--vsm-quant", choices=["int4", "int4mix"],
                    default="int4",
                    help="resident VSM decoder precision for --pair: "
                         "'int4mix' is the per-matrix int8/int4 split "
                         "(nn/quant.INT4MIX_INT4_KEYS, +1.8 GB)")
    ap.add_argument("--pair", choices=["int4", "mixed"], default=None,
                    help="co-residency accounting: also init a resident "
                         "int4 VSM 7B (and for 'mixed' an int8 VQA "
                         "decoder + int8 towers — the r5 mixed-precision "
                         "co-residency config) so live weights reflect "
                         "the pair; phase temps then bound the wave's "
                         "peak on the 16 GB chip")
    args = ap.parse_args()
    cfg = vqa_llm_7b()
    vqa_quant = "int4" if args.pair == "int4" else True
    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16,
                                 quantize_llm=vqa_quant)
    vsm_params = None
    if args.pair:
        from vstar_tpu.core.config import vsm_7b
        from vstar_tpu.models.vsm import init_vsm_params
        if args.pair == "mixed":
            from vstar_tpu.nn.quant import quantize_model_towers
            params = quantize_model_towers(params)
        vsm_params = init_vsm_params(jax.random.PRNGKey(1), vsm_7b(),
                                     dtype=jnp.bfloat16,
                                     quantize_llm=args.vsm_quant)
        if args.pair == "mixed":
            from vstar_tpu.nn.quant import quantize_model_towers
            vsm_params = quantize_model_towers(vsm_params)
    eng = VQAEngine(params, cfg, Tok(), prompt_buckets=(512,),
                    option_bucket=64, kv_int8=args.kv_int8,
                    prompt_lookup=args.prompt_lookup)
    print(f"kv_int8={args.kv_int8} prompt_lookup={args.prompt_lookup} "
          f"pair={args.pair}")
    print(f"weights+live arrays: {live_gb():.3f} GB"
          + (" (VQA + resident VSM)" if args.pair else ""))
    del vsm_params  # keep referenced-alive until after the live_gb read

    rng = np.random.RandomState(0)
    n = max(args.batches)
    imgs = [Image.fromarray((rng.rand(500, 600, 3) * 255).astype("uint8"))
            for _ in range(n)]
    qs = [f"is object {i} red or blue ?" for i in range(n)]
    opts = [["red thing", "blue thing", "green", "none"]] * n

    # capture the real call args of each phase program, then AOT-analyze
    # the same compiled executables (compiles are cached: same shapes)
    cap = {}
    real_fm, real_mc = eng._jit_free_form, eng._jit_mc

    def rec_fm(*a, **k):
        cap["fm"] = (a, k)
        return real_fm(*a, **k)

    def rec_mc(*a, **k):
        cap["mc"] = (a, k)
        return real_mc(*a, **k)

    eng._jit_free_form, eng._jit_mc = rec_fm, rec_mc
    for B in args.batches:
        eng.free_form_many(imgs[:B], qs[:B], max_new_tokens=32)
        eng.multiple_choice_many(imgs[:B], qs[:B], opts[:B])
        fm = analyze(real_fm, *cap["fm"])
        mc = analyze(real_mc, *cap["mc"])
        print(f"B={B} free-form: {fm}")
        print(f"B={B} mc-score : {mc}", flush=True)


if __name__ == "__main__":
    main()
