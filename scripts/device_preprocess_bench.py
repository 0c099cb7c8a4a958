"""Host-PIL vs on-device patch extraction for the 7B search path on a 2K
image (the latency gate's image size): times detect_many waves of 4
patches through BatchedVSMEngine with device_preprocess on/off.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/device_preprocess_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vsm_7b
from vstar_tpu.models.vsm import init_vsm_params
from vstar_tpu.search.batched import BatchedVSMEngine
from vstar_tpu.search.policy import PatchRef


from bench_common import Tok  # noqa: E402


def waves(image):
    """3 waves of 4 patches each: root + quadtree descents of a 2K image."""
    W, H = image.width, image.height
    w2, h2 = W // 2, H // 2
    return [
        [PatchRef(image, b) for b in
         ([0, 0, W, H], [0, 0, w2, h2], [w2, 0, w2, h2], [0, h2, w2, h2])],
        [PatchRef(image, b) for b in
         ([w2, h2, w2, h2], [0, 0, W, h2], [0, h2, W, h2],
          [W // 4, H // 4, w2, h2])],
        [PatchRef(image, b) for b in
         ([0, 0, w2, H], [w2, 0, w2, H], [W // 4, 0, w2, H],
          [W // 8, H // 8, 3 * W // 4, 3 * H // 4])],
    ]


def time_waves(eng, image, use_refs, label, n=3):
    names = ["red mug", "clock", "license plate", "street sign"]
    for rep in range(1 + n):
        if rep == 1:
            t0 = time.perf_counter()
        for wave in waves(image):
            patches = wave if use_refs else [r.pil() for r in wave]
            eng.detect_many(patches, names)
    dt = (time.perf_counter() - t0) / n / len(waves(image))
    print(f"{label:36s} {dt * 1000:8.1f} ms / 4-patch wave", flush=True)
    return dt


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    image = Image.fromarray(
        (rng.rand(1536, 2048, 3) * 255).astype("uint8"))

    cfg = vsm_7b()
    params = init_vsm_params(jax.random.PRNGKey(0), cfg,
                             dtype=jnp.bfloat16, quantize_llm=True)
    tok = Tok()
    host = BatchedVSMEngine(params, cfg, tok, loc_token_id=3,
                            max_new_tokens=24, prompt_buckets=(384,))
    dev = BatchedVSMEngine(params, cfg, tok, loc_token_id=3,
                           max_new_tokens=24, prompt_buckets=(384,),
                           device_preprocess=True)
    t_host = time_waves(host, image, False, "host PIL preprocess (2K image)")
    t_dev = time_waves(dev, image, True, "device canvas windows (2K image)")
    print(f"speedup {t_host / t_dev:.2f}x")


if __name__ == "__main__":
    main()
