"""Co-resident int4 SEAL pair on ONE 16 GB chip: the full V*Bench loop
with BOTH 7B models resident (no phase swaps).

The int8 pair measurably does not fit one v5e (~15 GB of weights alone,
BASELINE.md r2); group-128 int4 decoders cut the pair to ~9 GB, so both
engines load together and the phased runner's swaps disappear
(eval/phased.py coresident=True). This is the single-chip INTERACTIVE
serving mode — a per-request phase swap would be unusable; co-residency
trades decode speed (the int4 kernels run at 0.5-0.55x of the int8
XLA path, scripts/int4_bench.py) for zero swap cost and one-chip pair
serving.

Matches the same workload as bench.py's phase-swapped headline (same
synthetic benchmark, forced 3-step searches, B-sized waves) so the two
modes are directly comparable.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
       scripts/coresident_bench.py [--act-int8] [--batch 8] [--n 12]
"""
import argparse
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from vstar_tpu.core.config import vqa_llm_7b, vsm_7b
from vstar_tpu.eval.phased import eval_model_phased
from vstar_tpu.eval.synthetic import make_synthetic_benchmark
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine
from vstar_tpu.search.compiled import CompiledVSMSearch

from bench_common import FORCED_SEARCH as FORCED  # noqa: E402
from bench_common import Tok, sync_params as _sync  # noqa: E402

MAX_NEW_TOKENS = 16
SEARCH_STEPS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--act-int8", action="store_true", default=False,
                    help="per-token int8 activations: W4A8 decode kernel "
                         "+ W8A8 tower prefill (the all-opt-ins mode)")
    ap.add_argument("--mixed", nargs="?", const="vqa",
                    choices=["vqa", "vsm"], default=None,
                    help="mixed-precision co-residency (VERDICT r4 #1): "
                         "ONE decoder int8 (~7 GB), the other int4 "
                         "(~4.5 GB), towers int8 on both. 'vqa' (the "
                         "bare-flag default) runs free-form/MC at int8 "
                         "speed and searches pay int4; 'vsm' reverses "
                         "the split — the search phase dominates the "
                         "co-resident wall, so int8 searches + int4 "
                         "trigger/MC is the competing point; probe HBM "
                         "first (scripts/hbm_probe --pair mixed)")
    ap.add_argument("--vsm-quant", choices=["int4", "int4mix"],
                    default="int4",
                    help="precision of the int4-side VSM decoder: "
                         "'int4mix' upgrades qkvo+down to int8 per the "
                         "measured kernel truth table (+1.8 GB, faster "
                         "search decode) — probe HBM first "
                         "(hbm_probe --pair mixed --vsm-quant int4mix)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=12,
                    help="synthetic benchmark images")
    ap.add_argument("--image-hw", type=int, nargs=2, default=[1536, 2048])
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if args.act_int8:
        from vstar_tpu.nn.quant import set_act_int8
        set_act_int8(True)

    tok = Tok()
    vqa_cfg = vqa_llm_7b()
    vsm_cfg = vsm_7b()
    holders = {}

    # True = per-channel int8; the mixed split gives int8 to one decoder
    vqa_quant = True if args.mixed == "vqa" else "int4"
    vsm_quant = True if args.mixed == "vsm" else args.vsm_quant

    def vqa_factory():
        t0 = time.perf_counter()
        if "vqa" in holders:
            holders["vqa"].params = None   # free before re-init (HBM)
        params = _sync(init_vqa_llm_params(
            jax.random.PRNGKey(0), vqa_cfg, dtype=jnp.bfloat16,
            quantize_llm=vqa_quant))
        if args.mixed:
            # int8 towers too: the mixed pair must leave headroom for
            # B-sized wave temps (load_engines quantizes towers the same
            # way in the single-chip serving config)
            from vstar_tpu.nn.quant import quantize_model_towers
            params = quantize_model_towers(params)
        print(f"[load] vqa {vqa_quant} params "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        if "vqa" not in holders:
            holders["vqa"] = VQAEngine(params, vqa_cfg, tok,
                                       prompt_buckets=(512, 768),
                                       option_bucket=64)
        else:
            holders["vqa"].params = params
        return holders["vqa"]

    def vsm_factory():
        t0 = time.perf_counter()
        if "vsm" in holders:
            holders["vsm"].engine.params = None
        params = _sync(init_vsm_params(
            jax.random.PRNGKey(1), vsm_cfg, dtype=jnp.bfloat16,
            quantize_llm=vsm_quant))
        if args.mixed:
            from vstar_tpu.nn.quant import quantize_model_towers
            params = quantize_model_towers(params)
        print(f"[load] vsm {vsm_quant} params "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        if "vsm" not in holders:
            eng = BatchedVSMEngine(params, vsm_cfg, tok, loc_token_id=3,
                                   max_new_tokens=MAX_NEW_TOKENS,
                                   prompt_buckets=(384,),
                                   device_preprocess=True,
                                   speculative_template=None)
            holders["vsm"] = CompiledVSMSearch(
                eng, P=8, batch_buckets=(1, 2, 4, args.batch))
        else:
            holders["vsm"].engine.params = params
        return holders["vsm"]

    e2e_dir = tempfile.mkdtemp(prefix="vstar_cores_")
    make_synthetic_benchmark(e2e_dir, n_per_task=args.n // 2,
                             image_hw=tuple(args.image_hw))
    kw = dict(batch=args.batch, free_form_max_new_tokens=32,
              max_search_steps=SEARCH_STEPS,
              search_kwargs=dict(FORCED),
              force_missing=lambda s: list(
                  s["annotation"]["target_object"]),
              coresident=True, log=None)

    t0 = time.perf_counter()
    _, _, warm = eval_model_phased(e2e_dir, vqa_factory, vsm_factory, **kw)
    print(f"[warm] {time.perf_counter()-t0:.1f}s total; phases "
          f"{warm['phase1_s']:.2f}/{warm['phase2_s']:.2f}/"
          f"{warm['phase3_s']:.2f}s", flush=True)
    _, _, t = eval_model_phased(e2e_dir, vqa_factory, vsm_factory, **kw)
    print(f"[steady] phases {t['phase1_s']:.2f}/{t['phase2_s']:.2f}/"
          f"{t['phase3_s']:.2f}s over {t['n_images']} images "
          f"({t['n_searches']} searches); swaps {t['swap_total_s']:.2f}s; "
          f"{t['images_per_s_steady']:.3f} images/s "
          f"(act_int8={args.act_int8}, mixed={args.mixed}, "
          f"B={args.batch})", flush=True)


if __name__ == "__main__":
    main()
