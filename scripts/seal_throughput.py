"""End-to-end batched SEAL phases 1+3 (free-form trigger + option scoring)
at 7B on TPU: images/s without search (search cost measured separately).

--kv-int8: int8 KV cache (per-token/head scales) — halves cache residency
and decode-time KV reads; the r2 measurement put the B=8 knee on exactly
those reads (32 option rows ~ 5.4 GB bf16 KV)."""
import argparse
import time, zlib, sys
import numpy as np
from PIL import Image
import jax, jax.numpy as jnp
from vstar_tpu.core.config import vqa_llm_7b
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.nn.llama import init_llama_params

from bench_common import Tok  # noqa: E402

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-int8", action="store_true", default=False)
    ap.add_argument("--prompt-lookup", action="store_true", default=False)
    args = ap.parse_args()
    cfg = vqa_llm_7b()
    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                                 quantize_llm=True)
    eng = VQAEngine(params, cfg, Tok(), prompt_buckets=(512,),
                    option_bucket=64, kv_int8=args.kv_int8,
                    prompt_lookup=args.prompt_lookup)
    print(f"kv_int8={args.kv_int8} prompt_lookup={args.prompt_lookup}")

    rng = np.random.RandomState(0)
    imgs = [Image.fromarray((rng.rand(500, 600, 3) * 255).astype("uint8"))
            for _ in range(8)]
    qs = [f"is the small object number {i} red or blue ?" for i in range(8)]
    opts = [["red thing", "blue thing", "green", "none"]] * 8

    for B in (1, 4, 8):
        # warm (compile)
        eng.free_form_many(imgs[:B], qs[:B], max_new_tokens=32)
        eng.multiple_choice_many(imgs[:B], qs[:B], opts[:B])
        t0 = time.perf_counter()
        preds = eng.free_form_many(imgs[:B], qs[:B], max_new_tokens=32)
        chosen = eng.multiple_choice_many(imgs[:B], qs[:B], opts[:B])
        dt = time.perf_counter() - t0
        print(f"B={B}: phases 1+3 {dt*1000:7.0f} ms -> {B/dt:5.2f} images/s "
              f"(no-search path)", flush=True)


if __name__ == "__main__":
    main()
