"""On-device image preprocessing tests vs the host PIL path."""

import jax.numpy as jnp
import numpy as np
from PIL import Image

from vstar_tpu.data.preprocess import (clip_preprocess, expand2square,
                                       owlvit_preprocess)
from vstar_tpu.kernels.image_ops import (batched_crop_preprocess,
                                         crop_resize_normalize,
                                         device_preprocess,
                                         expand2square_device)


def _rand_img(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_device_preprocess_close_to_pil():
    arr = _rand_img()
    pil = owlvit_preprocess(Image.fromarray(arr), 48)
    dev = np.asarray(device_preprocess(jnp.asarray(arr), 48))
    # different bicubic windows/AA: expect close but not identical
    assert dev.shape == pil.shape
    diff = np.abs(dev - pil)
    assert np.median(diff) < 0.08 and diff.mean() < 0.15


def test_expand2square_device_matches_host():
    arr = _rand_img(60, 100)
    host, left, top = expand2square(Image.fromarray(arr))
    dev = np.asarray(expand2square_device(jnp.asarray(arr)))
    np.testing.assert_array_equal(dev, np.asarray(host))


def test_crop_resize_equivalent_to_crop_then_resize():
    arr = _rand_img(120, 150, seed=1)
    bbox = [30, 20, 64, 80]  # x, y, w, h
    fused = np.asarray(crop_resize_normalize(
        jnp.asarray(arr), jnp.asarray(bbox, jnp.float32), 32))
    cropped = jnp.asarray(arr[20:100, 30:94])
    two_step = np.asarray(device_preprocess(cropped, 32))
    # exact in the interior; borders differ because the fused kernel sees
    # pixels just outside the crop window
    np.testing.assert_allclose(fused[2:-2, 2:-2], two_step[2:-2, 2:-2],
                               rtol=1e-4, atol=1e-4)
    assert np.abs(fused - two_step).max() < 1.0


def test_batched_crops():
    arr = _rand_img(100, 100, seed=2)
    boxes = jnp.asarray([[0, 0, 50, 50], [25, 25, 50, 50]], jnp.float32)
    out = np.asarray(batched_crop_preprocess(jnp.asarray(arr), boxes, 24))
    assert out.shape == (2, 24, 24, 3)
    assert np.isfinite(out).all()
    assert not np.allclose(out[0], out[1])
