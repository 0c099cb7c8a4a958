"""Isolate the fused-search loop's policy cost: run the SAME while_loop
(window extraction + full VSM per iteration) with the policy transition
replaced by a fixed bbox schedule, vs the real fused_search. The delta is
what the on-device policy (heat resize, ancestor scores, queue ops) costs
per step; the fixed-schedule loop vs the host-driven per-step dispatch is
what the loop fusion itself buys.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_ablate_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.kernels.image_ops import window_resize
from vstar_tpu.models.vsm import init_vsm_params, vsm_generate
from vstar_tpu.search.batched import BatchedVSMEngine
from vstar_tpu.search.compiled import CompiledVSMSearch

import sys
sys.path.insert(0, "/root/repo/scripts")
from bench_common import Tok

STEPS = 4


def main():
    print("devices:", jax.devices())
    cfg = vsm_7b()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.bfloat16, quantize_llm=True)
    eng = BatchedVSMEngine(params, cfg, Tok(), loc_token_id=3,
                           max_new_tokens=24, prompt_buckets=(384,),
                           device_preprocess=True)
    comp = CompiledVSMSearch(eng, P=16)
    img = Image.fromarray((np.random.RandomState(0)
                           .rand(1536, 2048, 3) * 255).astype("uint8"))
    canvas = eng._canvas(img)

    lay, _, bucket = comp._prompt_layouts("red mug")
    from vstar_tpu.search.engine import _round128
    cache_len = bucket + _round128(eng.max_new_tokens)
    draft = jnp.asarray(eng._draft_row[None])
    text_ids = jnp.asarray(lay.text_ids[None])
    feat_idx = jnp.asarray(lay.feat_idx[None])
    is_feat = jnp.asarray(lay.is_feat[None])
    lens = jnp.asarray([lay.length], jnp.int32)

    # the same step boxes the real search visits (root + 3 quadrant-ish)
    schedule = jnp.asarray([[0, 0, 2048, 1536], [0, 0, 1024, 768],
                            [1024, 0, 1024, 768], [0, 768, 1024, 768]],
                           jnp.int32)

    def ablated(params, canvas, text_ids, feat_idx, is_feat, lens, draft):
        clip_size = cfg.vision.image_size
        owl_size = cfg.owl_vision.image_size

        def body(carry):
            i, acc = carry
            bbox = schedule[i]
            x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
            side = jnp.maximum(w, h)
            sq = jnp.stack([x0 - (side - w) // 2, y0 - (side - h) // 2,
                            side, side]).astype(jnp.float32)
            cr = bbox.astype(jnp.float32)
            clip_img = window_resize(canvas, sq, clip_size,
                                     mask_bbox=cr)[None]
            owl_img = window_resize(canvas, cr, owl_size,
                                    mask_bbox=cr)[None]
            out = vsm_generate(params, cfg, clip_img, owl_img, text_ids,
                               feat_idx, is_feat, lens, loc_token_id=3,
                               max_new_tokens=24, eos_id=2,
                               cache_len=cache_len,
                               compute_dtype=jnp.bfloat16,
                               draft_ids=draft, spec_chunk=8)
            return (i + 1, acc + jnp.sum(out.det_logits))

        _, acc = jax.lax.while_loop(lambda c: c[0] < STEPS, body,
                                    (jnp.int32(0), jnp.float32(0)))
        return acc

    jab = jax.jit(ablated)

    def run_ablated():
        float(jab(eng.params, canvas, text_ids, feat_idx, is_feat, lens,
                  draft))

    def run_fused():
        comp.search(img, "red mug", smallest_size=512,
                    confidence_high=2.0, target_cue_threshold=-1.0,
                    target_cue_threshold_minimum=-1.0, max_steps=STEPS)

    for label, run in (("ablated-loop", run_ablated),
                       ("fused-search", run_fused)):
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{label:13s}: reps {[f'{t:.2f}' for t in times]} s; "
              f"steady {dt:.3f} s -> {dt / STEPS * 1e3:6.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
