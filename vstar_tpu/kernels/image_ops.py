"""On-device image preprocessing (the SURVEY §7.6 "fused image hot path").

Host-side PIL preprocessing is exact-HF but becomes the bottleneck for
batched search (every wave crops + bicubic-resizes patches per image on
the CPU). These jittable ops move the hot path onto the TPU:

  * `device_preprocess`   — uint8 image -> resized + normalized float
    (bicubic via jax.image, matching PIL/HF's resampler family)
  * `crop_resize_normalize` — crop a bbox out of a device-resident image
    and resize+normalize in one fused program (the search crop pyramid:
    the full image uploads once; every patch of every wave is cropped on
    device with `jax.image.scale_and_translate`).

PIL and jax.image bicubic differ slightly at edges (anti-aliasing
windows), so the default engines keep PIL for exact reference parity;
the batched throughput path opts in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..multimodal.constants import CLIP_MEAN, CLIP_STD


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x / 255.0 - mean) / std


def normalize_u8_images(x_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., 3] -> CLIP-normalized f32. Host-resized images (exact
    PIL geometry, data/preprocess clip_resize_u8/owlvit_resize_u8) upload
    as u8 — 4x less relay traffic — and normalize here; the f32 math is
    the same expression as the host _normalize, so results match."""
    return _normalize(x_u8.astype(jnp.float32))


def device_preprocess(image_u8: jnp.ndarray, out_size: int,
                      method: str = "cubic") -> jnp.ndarray:
    """[H, W, 3] uint8 -> [out, out, 3] f32 normalized (aspect-distorting
    resize, OwlViTProcessor semantics)."""
    x = image_u8.astype(jnp.float32)
    y = jax.image.resize(x, (out_size, out_size, 3), method=method)
    return _normalize(y)


def expand2square_device(image_u8: jnp.ndarray, center: bool = True
                         ) -> jnp.ndarray:
    """Pad to square with the CLIP mean color on device. Static shapes:
    output side = max(H, W) (a static property of the input shape)."""
    H, W, _ = image_u8.shape
    side = max(H, W)
    fill = jnp.asarray([int(c * 255) for c in CLIP_MEAN], jnp.uint8)
    out = jnp.broadcast_to(fill, (side, side, 3)).astype(jnp.uint8)
    top = (side - H) // 2 if center else 0
    left = (side - W) // 2 if center else 0
    return jax.lax.dynamic_update_slice(out, image_u8, (top, left, 0))


def crop_resize_normalize(image_u8: jnp.ndarray, bbox: jnp.ndarray,
                          out_size: int, method: str = "cubic"
                          ) -> jnp.ndarray:
    """Crop [x, y, w, h] (pixels, f32, dynamic) from a device-resident
    image and resize+normalize to [out, out, 3] — one fused XLA program,
    no host round trip per patch.

    Uses scale_and_translate: output pixel centers map linearly onto the
    crop window (half-pixel convention), equivalent to crop-then-resize.
    """
    H, W, _ = image_u8.shape
    x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    scale = jnp.stack([out_size / h, out_size / w]).astype(jnp.float32)
    # out = (in - crop_origin) * scale. Matches crop-then-resize exactly
    # in the interior; at crop borders the sampling kernel legitimately
    # sees pixels just outside the box (crop-then-resize clamps instead).
    translation = -jnp.stack([y0, x0]).astype(jnp.float32) * scale
    y = jax.image.scale_and_translate(
        image_u8.astype(jnp.float32),
        (out_size, out_size, 3), (0, 1), scale, translation,
        method=method)
    return _normalize(y)


def batched_crop_preprocess(image_u8: jnp.ndarray, bboxes: jnp.ndarray,
                            out_size: int) -> jnp.ndarray:
    """[N, 4] crops of one image -> [N, out, out, 3] (vmapped fused op)."""
    return jax.vmap(lambda b: crop_resize_normalize(image_u8, b, out_size)
                    )(bboxes.astype(jnp.float32))


def window_resize(canvas_norm: jnp.ndarray, bbox: jnp.ndarray,
                  out_size: int, method: str = "cubic",
                  mask_bbox: jnp.ndarray = None) -> jnp.ndarray:
    """Resize a dynamic [x, y, w, h] window of a pre-normalized canvas to
    [out, out, 3]. Out-of-canvas samples are zero == normalized CLIP mean
    (normalize_canvas_device pads that way), matching expand2square fill.

    mask_bbox: zero canvas content OUTSIDE this [x, y, w, h] region before
    sampling. Required whenever the window extends beyond the crop INSIDE
    the image — expand2square pads with the mean color there, while an
    unmasked canvas would leak neighboring image content into the pad
    bands. XLA fuses the mask into the resize contractions."""
    x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    if mask_bbox is not None:
        mx, my, mw, mh = (mask_bbox[0], mask_bbox[1], mask_bbox[2],
                          mask_bbox[3])
        bh, bw, _ = canvas_norm.shape
        ys = jnp.arange(bh, dtype=jnp.float32)[:, None]
        xs = jnp.arange(bw, dtype=jnp.float32)[None, :]
        keep = ((ys >= my) & (ys < my + mh) & (xs >= mx) & (xs < mx + mw))
        canvas_norm = jnp.where(keep[..., None], canvas_norm, 0.0)
    scale = jnp.stack([out_size / h, out_size / w]).astype(jnp.float32)
    translation = -jnp.stack([y0, x0]).astype(jnp.float32) * scale
    return jax.image.scale_and_translate(
        canvas_norm, (out_size, out_size, 3), (0, 1), scale, translation,
        method=method)


def square_window(bbox) -> list:
    """Centered square window [x, y, side, side] around an [x, y, w, h]
    crop — the expand2square geometry (integer paste offsets like PIL)."""
    x0, y0, w, h = bbox
    side = max(w, h)
    return [x0 - (side - w) // 2, y0 - (side - h) // 2, side, side]


CANVAS_BUCKET = 512


def canvas_bucket_hw(h: int, w: int, bucket: int = CANVAS_BUCKET):
    """Bucketed canvas shape (bH, bW) for an HxW image — the single
    source of truth for canvas-shape grouping (u8_canvas padding and the
    grouped search dispatcher must agree, or same-bucket asserts fire)."""
    return (-(-h // bucket) * bucket, -(-w // bucket) * bucket)


def u8_canvas(image, bucket: int = CANVAS_BUCKET):
    """PIL image -> (uint8 canvas [bH, bW, 3] zero-padded, (H, W)).
    Upload this (3x smaller than f32) and finish with
    `normalize_canvas_device` on device."""
    import numpy as np

    arr = np.asarray(image.convert("RGB"), np.uint8)
    H, W = arr.shape[:2]
    bh, bw = canvas_bucket_hw(H, W, bucket)
    canvas = np.zeros((bh, bw, 3), np.uint8)
    canvas[:H, :W] = arr
    return canvas, (H, W)


def normalize_canvas_device(canvas_u8: jnp.ndarray, h: jnp.ndarray,
                            w: jnp.ndarray) -> jnp.ndarray:
    """uint8 canvas -> CLIP-normalized f32 with the pad region forced to
    zero (== the normalized mean color), preserving the expand2square
    fill semantics window_resize relies on. h/w are dynamic, so one
    program per canvas BUCKET shape serves every image size."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    norm = (canvas_u8.astype(jnp.float32) / 255.0 - mean) / std
    bh, bw, _ = canvas_u8.shape
    mask = ((jnp.arange(bh)[:, None] < h)
            & (jnp.arange(bw)[None, :] < w))
    return jnp.where(mask[..., None], norm, 0.0)


def pair_windows(canvas_norm: jnp.ndarray, sq_bboxes: jnp.ndarray,
                 crop_bboxes: jnp.ndarray, clip_size: int, owl_size: int):
    """Both tower inputs for N patches of one canvas in ONE program:
    [N,4] square windows -> [N, clip, clip, 3] and [N,4] crop windows ->
    [N, owl, owl, 3]. One dispatch per wave instead of two per patch.
    Content outside each crop bbox is masked to the mean color so the
    CLIP square window's pad bands match expand2square."""
    sq_bboxes = sq_bboxes.astype(jnp.float32)
    crop_bboxes = crop_bboxes.astype(jnp.float32)
    clip = jax.vmap(lambda sq, cr: window_resize(canvas_norm, sq,
                                                 clip_size, mask_bbox=cr)
                    )(sq_bboxes, crop_bboxes)
    owl = jax.vmap(lambda cr: window_resize(canvas_norm, cr, owl_size,
                                            mask_bbox=cr))(crop_bboxes)
    return clip, owl
