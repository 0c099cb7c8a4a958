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
    args = ap.parse_args()
    cfg = vqa_llm_7b()
    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16, quantize_llm=True)
    eng = VQAEngine(params, cfg, Tok(), prompt_buckets=(512,),
                    option_bucket=64, kv_int8=args.kv_int8,
                    prompt_lookup=args.prompt_lookup)
    print(f"kv_int8={args.kv_int8} prompt_lookup={args.prompt_lookup}")
    print(f"weights+live arrays: {live_gb():.3f} GB")

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
