"""Batched search tests: lockstep driver equivalence with serial search."""

import numpy as np
import pytest

from vstar_tpu.search.batched import _batch_bucket, run_batched_searches
from vstar_tpu.search.policy import iou_xywh, visual_search
from tests.test_search_policy import (TARGET, FakeImage, OracleVSM, W, H)


class BatchedOracle(OracleVSM):
    """Adds the *_many interface over the scripted oracle."""

    def detect_many(self, patches, names):
        return [self.detect(p, n) for p, n in zip(patches, names)]

    def vqa_many(self, patches, qs):
        return [self.vqa(p, q) for p, q in zip(patches, qs)]

    def segment_many(self, patches, phrases):
        return [self.segment(p, ph) for p, ph in zip(patches, phrases)]


def test_batch_bucket():
    assert _batch_bucket(1) == 1
    assert _batch_bucket(3) == 4
    assert _batch_bucket(9) == 16
    assert _batch_bucket(99) == 16


def test_batched_matches_serial():
    imgs = [FakeImage(), FakeImage(), FakeImage()]
    names = ["needle"] * 3
    serial = [visual_search(OracleVSM(), img, nm, smallest_size=224)
              for img, nm in zip(imgs, names)]
    batched = run_batched_searches(BatchedOracle(), imgs, names,
                                   smallest_size=224)
    assert len(batched) == 3
    for (fs_s, pl_s, ok_s, vb_s), (fs_b, pl_b, ok_b, vb_b) in zip(
            serial, batched):
        assert ok_s == ok_b and pl_s == pl_b
        np.testing.assert_allclose(fs_s.detection_result,
                                   fs_b.detection_result)
        found = fs_b.detection_result.copy()
        found[0] += fs_b.bbox[0]
        found[1] += fs_b.bbox[1]
        assert iou_xywh(found, TARGET) > 0.5


def test_batched_mixed_progress():
    """Searches finishing at different waves must not stall the rest."""
    class EarlyOracle(BatchedOracle):
        def detect(self, patch, name):
            boxes, logits, hm = super().detect(patch, name)
            if name == "easy":  # confident at the root
                boxes[0] = [0.5, 0.5, 0.1, 0.1]
                logits[0] = 0.95
            return boxes, logits, hm

    imgs = [FakeImage(), FakeImage()]
    res = run_batched_searches(EarlyOracle(), imgs, ["easy", "needle"],
                               smallest_size=224)
    (f0, p0, ok0, _), (f1, p1, ok1, _) = res
    assert ok0 and p0 == 1      # finished at the root
    assert ok1 and p1 > 1       # kept searching after the first finished


def test_batched_engine_matches_serial_engine():
    """BatchedVSMEngine._run_many (padding, stacked layouts, drafts) must
    give the same per-patch outputs as the serial engine."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.batched import BatchedVSMEngine
    from tests.test_data import WordTokenizer

    cfg = vsm_tiny()
    tok = WordTokenizer()
    eng = BatchedVSMEngine(
        init_vsm_params(jax.random.PRNGKey(2), cfg), cfg, tok,
        loc_token_id=tok._word_id("[LOC]"), max_new_tokens=4,
        prompt_buckets=(64, 128), compute_dtype=jnp.float32)

    rng = np.random.RandomState(3)
    patches = [Image.fromarray((rng.rand(40 + 8 * i, 60, 3) * 255
                                ).astype("uint8")) for i in range(3)]
    names = ["cat", "dog", "cup"]

    serial = [eng.detect(p, n) for p, n in zip(patches, names)]
    batched = eng.detect_many(patches, names)
    for (b1, l1, h1), (b2, l2, h2) in zip(serial, batched):
        np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(h1, h2, rtol=1e-3, atol=1e-3)

    s_txt = [eng.vqa(p, "what is here?") for p in patches]
    b_txt = eng.vqa_many(patches, ["what is here?"] * 3)
    assert s_txt == b_txt


def test_patch_ref_matches_eager_crop():
    from PIL import Image
    from vstar_tpu.search.policy import PatchRef

    rng = np.random.RandomState(7)
    img = Image.fromarray((rng.rand(120, 160, 3) * 255).astype("uint8"))
    # float bbox: PatchRef must reproduce PIL's int(l),int(t),int(r),int(b)
    bbox = [10.7, 5.2, 60.9, 44.5]
    ref = PatchRef(img, bbox)
    eager = img.crop((int(bbox[0]), int(bbox[1]),
                      int(bbox[0] + bbox[2]), int(bbox[1] + bbox[3])))
    assert (ref.width, ref.height) == eager.size
    np.testing.assert_array_equal(np.asarray(ref.pil()), np.asarray(eager))


def test_device_preprocess_matches_host_window():
    """Device canvas window-pair vs host PIL crop+expand2square+resize:
    same content within resampler tolerance (jax cubic vs PIL bicubic
    differ at the kernel level — the device path is the opt-in throughput
    mode, not the exact-parity default). Uses the production upload path
    (u8 canvas + on-device normalize) and the production fused
    pair_windows, whose crop mask reproduces expand2square's mean fill
    for the square window's pad bands."""
    import jax.numpy as jnp
    from PIL import Image
    from vstar_tpu.data.preprocess import (clip_preprocess, expand2square,
                                           owlvit_preprocess)
    from vstar_tpu.kernels.image_ops import (normalize_canvas_device,
                                             pair_windows, square_window,
                                             u8_canvas)
    from vstar_tpu.multimodal.constants import CLIP_MEAN, CLIP_STD
    from vstar_tpu.search.policy import PatchRef

    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(300, 420, 3) * 255).astype("uint8"))
    ref = PatchRef(img, [37, 22, 180, 120])
    c8, (h, w) = u8_canvas(img)
    assert c8.shape == (512, 512, 3) and (h, w) == (300, 420)
    canvas = normalize_canvas_device(jnp.asarray(c8), h, w)
    # canvas = normalized image content; pad region exactly 0 (mean)
    host_norm = ((np.asarray(img, np.float32) / 255.0
                  - np.asarray(CLIP_MEAN, np.float32))
                 / np.asarray(CLIP_STD, np.float32))
    np.testing.assert_allclose(np.asarray(canvas)[:300, :420], host_norm,
                               atol=1e-5)
    assert np.all(np.asarray(canvas)[300:] == 0)
    assert np.all(np.asarray(canvas)[:, 420:] == 0)

    clip_dev_b, owl_dev_b = pair_windows(
        canvas, jnp.asarray([square_window(ref.bbox)], jnp.float32),
        jnp.asarray([ref.bbox], jnp.float32), 28, 48)
    clip_dev = np.asarray(clip_dev_b[0])
    owl_dev = np.asarray(owl_dev_b[0])
    crop = ref.pil()
    sq, _, _ = expand2square(crop)
    clip_host = clip_preprocess(sq, 28)
    owl_host = owlvit_preprocess(crop, 48)
    # noise images are the resampler worst case; tolerances are content-
    # level. Before the crop mask the clip diff was mean .068/max .70
    # (pad bands leaked neighboring image content).
    assert np.abs(clip_dev - clip_host).mean() < 0.04
    assert np.abs(clip_dev - clip_host).max() < 0.6
    assert np.abs(owl_dev - owl_host).mean() < 0.03
    assert np.abs(owl_dev - owl_host).max() < 0.5


def test_device_preprocess_engine_close_to_host_engine():
    """detect_many with device-resident patch extraction vs host PIL
    preprocessing through the real (tiny) VSM: same decode, close heads."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.batched import BatchedVSMEngine
    from vstar_tpu.search.policy import PatchRef
    from tests.test_data import WordTokenizer

    cfg = vsm_tiny()
    tok = WordTokenizer()
    params = init_vsm_params(jax.random.PRNGKey(2), cfg)
    host = BatchedVSMEngine(params, cfg, tok,
                            loc_token_id=tok._word_id("[LOC]"),
                            max_new_tokens=4, prompt_buckets=(64, 128),
                            compute_dtype=jnp.float32)
    dev = BatchedVSMEngine(params, cfg, tok,
                           loc_token_id=tok._word_id("[LOC]"),
                           max_new_tokens=4, prompt_buckets=(64, 128),
                           compute_dtype=jnp.float32,
                           device_preprocess=True)
    assert dev.wants_patch_refs and not host.wants_patch_refs

    rng = np.random.RandomState(3)
    img = Image.fromarray((rng.rand(200, 260, 3) * 255).astype("uint8"))
    refs = [PatchRef(img, [0, 0, 260, 200]), PatchRef(img, [30, 20, 90, 70])]
    names = ["cat", "dog"]
    out_host = host.detect_many([r.pil() for r in refs], names)
    out_dev = dev.detect_many(refs, names)
    for (b1, l1, h1), (b2, l2, h2) in zip(out_host, out_dev):
        assert b1.shape == b2.shape and l1.shape == l2.shape
        assert h1.shape == h2.shape
        if l1.size:   # same patch content -> close head outputs
            np.testing.assert_allclose(l1, l2, atol=0.2)


def test_grouped_searches_image_batch_1_keeps_device_engine():
    """--device-preprocess at --image-batch 1 must still route through
    the batched driver (waves of one) — the serial path unwraps
    PatchRefs and would silently disable on-device extraction."""
    from vstar_tpu.search.batched import run_grouped_searches

    seen = {"refs": 0, "pil": 0}

    class RefAwareOracle(BatchedOracle):
        wants_patch_refs = True

        def detect_many(self, patches, names):
            from vstar_tpu.search.policy import PatchRef
            for p in patches:
                seen["refs" if isinstance(p, PatchRef) else "pil"] += 1
            return [self.detect(p.pil() if hasattr(p, "pil") else p, n)
                    for p, n in zip(patches, names)]

        def vqa_many(self, patches, qs):
            return [self.vqa(getattr(p, "pil", lambda: p)(), q)
                    for p, q in zip(patches, qs)]

        def segment_many(self, patches, phrases):
            return [self.segment(getattr(p, "pil", lambda: p)(), ph)
                    for p, ph in zip(patches, phrases)]

    tasks = [{"image": FakeImage(), "name": "needle", "smallest": 224}]
    outs = run_grouped_searches(RefAwareOracle(), tasks, image_batch=1)
    assert len(outs) == 1 and outs[0] is not None
    assert seen["refs"] > 0 and seen["pil"] == 0


def test_canvas_cache_is_lru():
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from vstar_tpu.core.config import vsm_tiny
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.search.batched import BatchedVSMEngine
    from tests.test_data import WordTokenizer

    cfg = vsm_tiny()
    tok = WordTokenizer()
    eng = BatchedVSMEngine(init_vsm_params(jax.random.PRNGKey(0), cfg),
                           cfg, tok, loc_token_id=tok._word_id("[LOC]"),
                           compute_dtype=jnp.float32,
                           device_preprocess=True)
    imgs = [Image.new("RGB", (40, 30)) for _ in range(18)]
    for im in imgs:
        eng._canvas(im)
    assert len(eng._canvas_cache) == 16
    # most-recently-used survive; the first two were evicted
    assert id(imgs[0]) not in eng._canvas_cache
    assert id(imgs[17]) in eng._canvas_cache
    # re-touching an old survivor keeps it alive past the next insert
    eng._canvas(imgs[2])
    eng._canvas(Image.new("RGB", (40, 30)))
    assert id(imgs[2]) in eng._canvas_cache
