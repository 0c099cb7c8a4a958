"""Continuous-batching serving throughput at 7B on TPU: N concurrent
multiple-choice requests through ContinuousSealService vs the serialized
SealService (no-search path; random weights never emit the exact
missing-objects trigger sentence).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_throughput.py
"""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.core.config import vqa_llm_7b
from vstar_tpu.eval.vqa_engine import VQAEngine
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.serve.continuous import ContinuousSealService
from vstar_tpu.serve.server import SealService


from bench_common import Tok  # noqa: E402


class ShortVQA(VQAEngine):
    def free_form(self, image, question, **kw):
        kw.setdefault("max_new_tokens", 32)
        return super().free_form(image, question, **kw)

    def free_form_many(self, images, questions, **kw):
        kw.setdefault("max_new_tokens", 32)
        return super().free_form_many(images, questions, **kw)


def drive(service, imgs, qs, opts, conc):
    t0 = time.perf_counter()
    threads = []
    for i in range(len(imgs)):
        t = threading.Thread(target=service.answer,
                             args=(imgs[i], qs[i], opts[i]))
        t.start()
        threads.append(t)
        if len(threads) >= conc and (i + 1) % conc == 0:
            for t in threads:
                t.join()
            threads = []
    for t in threads:
        t.join()
    return len(imgs) / (time.perf_counter() - t0)


def main():
    cfg = vqa_llm_7b()
    params = init_vqa_llm_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16, quantize_llm=True)
    eng = ShortVQA(params, cfg, Tok(), prompt_buckets=(512,),
                   option_bucket=64)

    rng = np.random.RandomState(0)
    N = 8
    imgs = [Image.fromarray((rng.rand(500, 600, 3) * 255).astype("uint8"))
            for _ in range(N)]
    qs = [f"is the small object number {i} red or blue ?" for i in range(N)]
    opts = [["red thing", "blue thing", "green", "none"]] * N

    class NoVSM:  # never reached on the no-search path
        pass

    serial = SealService(eng, NoVSM())
    serial.answer(imgs[0], qs[0], opts[0])  # compile B=1 programs
    r_serial = drive(serial, imgs, qs, opts, conc=1)
    print(f"serialized SealService:        {r_serial:5.2f} req/s")

    svc = ContinuousSealService(eng, NoVSM(), max_batch=8, window_ms=50.0)
    drive(svc, imgs, qs, opts, conc=8)      # compile B=8 programs
    r_cont = drive(svc, imgs, qs, opts, conc=8)
    st = svc.stats()
    print(f"continuous (8 concurrent):     {r_cont:5.2f} req/s "
          f"({r_cont / r_serial:.2f}x, waves {st['waves']}, "
          f"mean wave {st['mean_wave']:.1f})")
    svc.close()


if __name__ == "__main__":
    main()
