"""Batched visual search: many searches advance in lockstep, and their VSM
calls execute as one device batch per wave.

This is the throughput capability the reference lacks (its search runs one
cache-less VSM generation at a time; SURVEY.md §2.8 workload 4): batch
efficiency comes from sharing the 7B weight reads across concurrent
searches — decode is weight-bandwidth-bound, so B searches cost barely
more than one.

Batch sizes are bucketed to powers of two (padded with a repeated row) so
only a handful of program shapes compile.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.preprocess import (clip_resize_u8, expand2square,
                               owlvit_resize_u8)
from ..multimodal.splicing import build_layout
from ..multimodal.tokenizer import tokenize_with_image
from .engine import VSMEngine, _round128
from .policy import PatchRef, unwrap_patch, visual_search_gen


BATCH_BUCKETS = (1, 2, 4, 8, 16)


def _batch_bucket(n: int, buckets=BATCH_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class BatchedVSMEngine(VSMEngine):
    """VSMEngine whose modes also accept lists (one device batch).

    device_preprocess=True opts the lockstep search path into on-device
    patch extraction (kernels/image_ops.py): each source image uploads
    ONCE as a normalized bucketed canvas; every patch of every wave is a
    dynamic window-resize on device (CLIP square window + OwlViT crop
    window), so no per-step host crop/resize or multi-MB patch upload.
    jax.image cubic differs from PIL bicubic at the sampling-kernel level,
    so the exact-reference-parity default stays on host preprocessing."""

    def __init__(self, *args, device_preprocess: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        import threading
        from collections import OrderedDict
        from concurrent.futures import ThreadPoolExecutor
        self.device_preprocess = device_preprocess
        # id(image) -> (device canvas, image ref), LRU. Capacity adapts
        # to the widest lockstep group seen (a >16-image group would
        # otherwise thrash: each 16-row chunk evicting the previous
        # chunk's canvases every wave), capped to bound HBM (48 2K
        # canvases ~ 1.8 GB f32).
        self._canvas_cache = OrderedDict()
        self._canvas_capacity = 16
        self._canvas_lock = threading.Lock()
        self._canvas_inflight = {}
        self._canvas_pool = None
        if device_preprocess:
            import functools
            import jax

            from ..kernels.image_ops import (normalize_canvas_device,
                                             pair_windows)
            self._jit_pair = jax.jit(
                functools.partial(pair_windows),
                static_argnames=("clip_size", "owl_size"))
            self._jit_norm = jax.jit(normalize_canvas_device)
            self._canvas_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="canvas-prefetch")

    @property
    def wants_patch_refs(self) -> bool:
        return self.device_preprocess

    def set_canvas_capacity(self, n: int):
        """Bound retained device canvases (~50 MB each at 2K f32) and
        trim immediately. Serving sets this to its wave size + 1: fresh
        per-request images never hit the LRU across waves, so retained
        entries are pure HBM pressure there (measured r5: 16 stale
        canvases + the co-resident mixed pair pushed max_batch=8 trigger
        waves into ResourceExhausted)."""
        with self._canvas_lock:
            self._canvas_capacity = max(1, int(n))
            while len(self._canvas_cache) > self._canvas_capacity:
                self._canvas_cache.popitem(last=False)

    def _canvas_insert(self, key, dev, image):
        # caller holds _canvas_lock; entries hold the image ref, so
        # cached ids stay valid
        while len(self._canvas_cache) >= self._canvas_capacity:
            self._canvas_cache.popitem(last=False)
        self._canvas_cache[key] = (dev, image)

    def _canvas_build(self, image):
        # uint8 upload (3x smaller than f32), normalized + mean-padded on
        # device
        from ..kernels.image_ops import u8_canvas
        arr, (h, w) = u8_canvas(image)
        return self._jit_norm(jnp.asarray(arr), jnp.int32(h),
                              jnp.int32(w))

    def prefetch_canvas(self, image):
        """Start this image's canvas upload on a background thread —
        overlap the 2K upload with whatever the caller does next (group
        assembly, prompt builds, the PREVIOUS group's waves). `_canvas`
        picks up the in-flight result instead of re-uploading.

        No-op on the axon relay: it serializes transfers FIFO, so a
        background upload queues AHEAD of the foreground dispatches
        instead of overlapping (measured 4.5x slower pipelined searches,
        r3 bench.py note). Overlap needs PCIe-local transfer/compute
        concurrency."""
        if not self.device_preprocess:
            return
        from ..utils.hw import is_axon_relay
        if is_axon_relay():
            # the relay device reports platform "tpu", so this must NOT
            # be a platform-string check (it silently never fired as one
            # — r3 review); the env marker is the reliable signal
            return
        key = id(image)
        with self._canvas_lock:
            hit = self._canvas_cache.get(key)
            if (hit is not None and hit[1] is image) \
                    or key in self._canvas_inflight:
                return

            def build(image=image):
                # On completion the result moves into the bounded LRU
                # cache and the inflight marker is dropped — never-consumed
                # prefetches (direct-answer requests trigger no search) are
                # evicted like any cache entry instead of pinning canvases
                # in _canvas_inflight forever; a failed build clears the
                # marker so _canvas() retries synchronously.
                try:
                    dev = self._canvas_build(image)
                    # force the transfer/normalize to finish ON THIS
                    # thread (relay block_until_ready returns early; a
                    # scalar fetch is the reliable sync)
                    float(dev[0, 0, 0])
                    with self._canvas_lock:
                        self._canvas_insert(key, dev, image)
                    return dev, image
                finally:
                    with self._canvas_lock:
                        self._canvas_inflight.pop(key, None)

            self._canvas_inflight[key] = self._canvas_pool.submit(build)

    def _canvas(self, image):
        key = id(image)
        with self._canvas_lock:
            hit = self._canvas_cache.get(key)
            if hit is not None and hit[1] is image:
                self._canvas_cache.move_to_end(key)
                return hit[0]
            fut = self._canvas_inflight.get(key)
        if fut is not None:
            try:
                dev, ref = fut.result()
            except Exception:
                dev, ref = None, None  # fall through to a sync rebuild
            if ref is image:
                return dev
        dev = self._canvas_build(image)
        with self._canvas_lock:
            self._canvas_insert(key, dev, image)
        return dev

    def _run_many(self, images: Sequence, questions: Sequence[str]):
        n = len(images)
        assert n > 0
        if self.device_preprocess:
            distinct = len({id(p.image) for p in images
                            if isinstance(p, PatchRef)})
            self._canvas_capacity = min(
                max(self._canvas_capacity, distinct + 1), 48)
        max_bb = BATCH_BUCKETS[-1]
        if n > max_bb:
            # split oversized waves into bucket-sized device batches and
            # concatenate the outputs (r1 silently compiled B=n shapes)
            import jax.numpy as _jnp
            parts = [self._run_many(images[a:a + max_bb],
                                    questions[a:a + max_bb])[0]
                     for a in range(0, n, max_bb)]
            merged = type(parts[0])(*[
                _jnp.concatenate([getattr(p, f) for p in parts], axis=0)
                for f in parts[0]._fields])
            return merged, n
        prompts = [self._build_prompt(q) for q in questions]
        ids_list = [tokenize_with_image(p, self.tokenizer) for p in prompts]
        n_img = self.cfg.image_tokens
        bucket = self._bucket(max(len(ids) - 1 + n_img
                                  for ids in ids_list))
        lays = [build_layout(ids, bucket, n_long=n_img, n_short=0,
                             image_long=True) for ids in ids_list]

        bb = _batch_bucket(n)
        pad = bb - n
        clip_size = self.cfg.vision.image_size
        owl_size = self.cfg.owl_vision.image_size
        clips, owls = [None] * n, [None] * n
        dev_groups: Dict[int, list] = {}
        for i, img in enumerate(images):
            if self.device_preprocess and isinstance(img, PatchRef):
                # group device patches by source canvas: ONE fused
                # vmapped window-pair program per (canvas, wave)
                g = dev_groups.setdefault(
                    id(img.image), [self._canvas(img.image), [], [], []])
                g[1].append(i)
                from ..kernels.image_ops import square_window
                g[2].append(square_window(img.bbox))
                g[3].append(img.bbox)
            else:
                img = unwrap_patch(img)
                sq, _, _ = expand2square(img)
                # u8 rows (exact PIL geometry): all-host waves upload 4x
                # less and normalize inside vsm_generate
                clips[i] = clip_resize_u8(sq, clip_size)
                owls[i] = owlvit_resize_u8(img, owl_size)
        for canvas, idxs, sqs, crops in dev_groups.values():
            nb = _batch_bucket(len(idxs))
            sqs = sqs + [sqs[0]] * (nb - len(idxs))
            crops = crops + [crops[0]] * (nb - len(idxs))
            c, o = self._jit_pair(canvas,
                                  jnp.asarray(sqs, jnp.float32),
                                  jnp.asarray(crops, jnp.float32),
                                  clip_size=clip_size, owl_size=owl_size)
            for j, i in enumerate(idxs):
                clips[i] = c[j]
                owls[i] = o[j]
        for _ in range(pad):
            clips.append(clips[0])
            owls.append(owls[0])
            lays.append(lays[0])

        def stack(rows):
            # all-host rows: ONE bulk u8 upload (jnp.stack of numpy rows
            # would device_put each row separately — 5-15 ms dispatch
            # apiece through the relay); device rows: concat on device.
            # Mixed waves hold normalized-f32 device rows, so u8 host
            # rows normalize on the HOST there (identical math) before
            # stacking — dtypes must agree.
            if dev_groups:
                from ..data.preprocess import _normalize
                from ..multimodal.constants import CLIP_MEAN, CLIP_STD
                rows = [_normalize(r, CLIP_MEAN, CLIP_STD)
                        if isinstance(r, np.ndarray) else r for r in rows]
                return jnp.stack(rows)
            return jnp.asarray(np.stack(rows))

        draft = None
        if self._draft_row is not None:
            draft = jnp.asarray(np.tile(self._draft_row[None], (bb, 1)))
        out = self._jit_generate(
            self.params, self.cfg, stack(clips),
            stack(owls),
            jnp.asarray(np.stack([l.text_ids for l in lays])),
            jnp.asarray(np.stack([l.feat_idx for l in lays])),
            jnp.asarray(np.stack([l.is_feat for l in lays])),
            jnp.asarray([l.length for l in lays], jnp.int32),
            loc_token_id=self.loc_token_id,
            max_new_tokens=self.max_new_tokens, eos_id=self.eos_id,
            cache_len=bucket + _round128(self.max_new_tokens
                                         + self.spec_chunk),
            compute_dtype=self.compute_dtype, draft_ids=draft,
            spec_chunk=self.spec_chunk)
        return out, n

    def _heatmap_row(self, out, b: int, size: Tuple[int, int]) -> np.ndarray:
        from ..data.preprocess import resize_bilinear_torch
        if not bool(out.loc_valid[b]):
            return np.zeros(size, np.float32)
        low = np.asarray(out.mask_logits[b], np.float32)
        return np.clip(resize_bilinear_torch(low, size[0], size[1]), 0, None)

    def detect_many(self, patches: Sequence, names: Sequence[str]):
        qs = [f"Please locate the {n} in this image." for n in names]
        out, n = self._run_many(patches, qs)
        results = []
        for b in range(n):
            size = (patches[b].height, patches[b].width)
            if not bool(out.loc_valid[b]):
                results.append((np.zeros((0, 4), np.float32),
                                np.zeros((0,), np.float32),
                                np.zeros(size, np.float32)))
                continue
            boxes = np.asarray(out.det_boxes[b], np.float32)
            logits = 1.0 / (1.0 + np.exp(-np.asarray(out.det_logits[b],
                                                     np.float32)))
            results.append((boxes, logits, self._heatmap_row(out, b, size)))
        return results

    def vqa_many(self, patches: Sequence, questions: Sequence[str]):
        out, n = self._run_many(patches, questions)
        results = []
        for b in range(n):
            ng = int(out.num_generated[b])
            toks = [int(t) for t in np.asarray(out.tokens[b, :ng])]
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
            results.append(text.replace("\n", "").replace("  ", " ").strip())
        return results

    def segment_many(self, patches: Sequence, phrases: Sequence[str]):
        qs = [f"Please locate the {p} in this image." for p in phrases]
        out, n = self._run_many(patches, qs)
        return [self._heatmap_row(out, b, (patches[b].height,
                                           patches[b].width))
                for b in range(n)]


def run_batched_searches(engine: BatchedVSMEngine, images: Sequence,
                         names: Sequence[str], target_bboxes=None,
                         visualize: bool = False, save_paths=None,
                         **search_kwargs) -> List[Tuple]:
    """Run len(images) guided searches concurrently; VSM requests of the
    same kind execute as one batch per wave. Results match
    `visual_search`'s return tuple per image. With visualize=True each
    task writes its step/heatmap overlays under its save_paths entry
    (per-generator search paths, so lockstep tasks never mix)."""
    n = len(images)
    if visualize:
        assert save_paths is not None and len(save_paths) == n
    paths: List[List] = [[] for _ in range(n)]
    gens = [visual_search_gen(images[i], names[i], path_out=paths[i],
                              **search_kwargs)
            for i in range(n)]
    results: List[Optional[Tuple]] = [None] * n
    pending: Dict[int, Tuple] = {}
    for i, g in enumerate(gens):
        try:
            pending[i] = next(g)
        except StopIteration as stop:  # pragma: no cover (degenerate)
            results[i] = stop.value

    dispatch = {"detect": engine.detect_many, "vqa": engine.vqa_many,
                "segment": engine.segment_many}
    while pending:
        for kind in ("detect", "vqa", "segment"):
            idxs = [i for i, (k, _, _) in pending.items() if k == kind]
            if not idxs:
                continue
            patches = [pending[i][1] for i in idxs]
            if not getattr(engine, "wants_patch_refs", False):
                from .policy import unwrap_patch
                patches = [unwrap_patch(p) for p in patches]
            texts = [pending[i][2] for i in idxs]
            outs = dispatch[kind](patches, texts)
            for i, out in zip(idxs, outs):
                try:
                    pending[i] = gens[i].send(out)
                except StopIteration as stop:
                    results[i] = stop.value
                    del pending[i]
    if visualize:
        from .visualize import visualize_search_path
        for i in range(n):
            _, plen, ok, _ = results[i]
            vis_len = plen if ok else len(paths[i])
            visualize_search_path(
                images[i], paths[i], vis_len,
                None if target_bboxes is None else target_bboxes[i],
                names[i], save_paths[i])
    return results


def run_grouped_searches(engine, tasks: Sequence[Dict], image_batch=None,
                         max_steps=None, visualize: bool = False,
                         **policy_kw) -> List[Tuple]:
    """Dispatch searches whose smallest_size differs per task.

    tasks: dicts with 'image' (PIL image, or a zero-arg callable for lazy
    decode), 'name', 'smallest', optional 'gt_bbox' and 'vis_path'.
    Groups tasks by smallest_size (run_batched_searches takes shared
    kwargs), chunks each group into image_batch-sized lockstep waves, and
    falls back to serial `visual_search` when the engine has no
    detect_many (or image_batch == 1). Results in task order, each the
    `visual_search` return tuple."""
    from collections import defaultdict

    from .policy import visual_search

    def img(t):
        im = t["image"]
        return im() if callable(im) else im

    outs: List[Optional[Tuple]] = [None] * len(tasks)
    # Whole-search-on-device engine (search/compiled.CompiledVSMSearch):
    # consecutive tasks whose images land in the same canvas bucket run
    # as ONE batched fused program (search_many — the 7B weight reads
    # shared across concurrent searches); image_batch is capped by the
    # engine's batch buckets. Shared-image tasks reuse the decoded object
    # so the canvas cache hits by id.
    if hasattr(engine, "search") and not hasattr(engine, "detect_many"):
        if visualize:
            raise ValueError(
                "compiled search keeps heatmaps on device; use the host "
                "or batched engine for --visualization")
        max_b = engine.BATCH_BUCKETS[-1]
        if image_batch:
            max_b = min(max_b, image_batch)

        def bucket_of(im):
            from ..kernels.image_ops import canvas_bucket_hw
            return canvas_bucket_hw(im.height, im.width)

        chunk_idx: List[int] = []
        chunk_imgs: List = []
        cur_bucket = None

        def flush():
            if not chunk_idx:
                return
            res = engine.search_many(
                chunk_imgs, [tasks[j]["name"] for j in chunk_idx],
                [tasks[j]["smallest"] for j in chunk_idx],
                max_steps=max_steps, **policy_kw)
            for j, r in zip(chunk_idx, res):
                outs[j] = r
            chunk_idx.clear()
            chunk_imgs.clear()

        prev_factory, prev_img = None, None
        for i, t in enumerate(tasks):
            im = prev_img if t["image"] is prev_factory else img(t)
            prev_factory, prev_img = t["image"], im
            bk = bucket_of(im)
            if chunk_idx and (bk != cur_bucket
                              or len(chunk_idx) >= max_b):
                flush()
            cur_bucket = bk
            chunk_idx.append(i)
            chunk_imgs.append(im)
        flush()
        return outs
    # device-preprocess engines stay on the batched driver even at
    # image_batch == 1 (waves of one): the serial path unwraps PatchRefs
    # to PIL, which would silently disable on-device extraction
    serial = not hasattr(engine, "detect_many") or (
        image_batch == 1 and not getattr(engine, "wants_patch_refs",
                                         False))
    if serial:
        for i, t in enumerate(tasks):
            outs[i] = visual_search(
                engine, img(t), t["name"], smallest_size=t["smallest"],
                target_bbox=t.get("gt_bbox"), max_steps=max_steps,
                visualize=visualize, save_path=t.get("vis_path"),
                **policy_kw)
        return outs
    by_small: Dict[int, List[int]] = defaultdict(list)
    for i, t in enumerate(tasks):
        by_small[t["smallest"]].append(i)
    for s_val, idxs in by_small.items():
        step = image_batch or len(idxs)
        for a in range(0, len(idxs), step):
            grp = idxs[a:a + step]
            res = run_batched_searches(
                engine, [img(tasks[i]) for i in grp],
                [tasks[i]["name"] for i in grp],
                target_bboxes=[tasks[i].get("gt_bbox") for i in grp],
                visualize=visualize,
                save_paths=[tasks[i].get("vis_path") for i in grp],
                smallest_size=s_val, max_steps=max_steps, **policy_kw)
            for i, r in zip(grp, res):
                outs[i] = r
    return outs


def _filler_for_bucket(length_of, lo: int, hi: int):
    """Grow a filler question until its spliced length lands in
    (lo, hi]. Host-only token counting; returns None if unreachable."""
    k = 1
    while k < 20000:
        text = "where is the " + "very " * k + "small object ?"
        n = length_of(text)
        if n > hi:
            return None
        if n > lo:
            return text
        k += max(1, (lo - n) // 2 + 1)
    return None


def warmup_vsm_engine(engine: BatchedVSMEngine,
                      canvas_sizes=((512, 512),),
                      batch_buckets=(1, 2, 4, 8, 16), log=print):
    """Pre-compile the search programs so no live wave stalls on a
    20-230 s remote compile (serve.server --warmup): every (mode x
    batch-bucket x PROMPT-bucket) generate program, and for
    device-preprocess engines the canvas normalize/window programs per
    canvas_sizes bucket (pass the 512-multiple shapes your image sizes
    bucket to, e.g. (1536, 2048) for 2K traffic)."""
    import numpy as np
    from PIL import Image

    from ..multimodal.tokenizer import tokenize_with_image
    from .policy import PatchRef

    def length_of(q):
        ids = tokenize_with_image(engine._build_prompt(q),
                                  engine.tokenizer)
        return len(ids) - 1 + engine.cfg.image_tokens

    # one question per prompt bucket (the short default text covers the
    # smallest; fillers reach each larger bucket)
    texts = ["where is the small object ?"]
    lo = engine.prompt_buckets[0]
    for b in engine.prompt_buckets[1:]:
        t = _filler_for_bucket(length_of, lo, b)
        if t is not None:
            texts.append(t)
        elif log:  # no-silent-caps: this bucket stays cold
            log(f"[warmup] vsm prompt bucket {b} unreachable by filler "
                f"text — first live prompt in ({lo}, {b}] will compile")
        lo = b

    rng = np.random.RandomState(0)

    def make_patch(h, w):
        img = Image.fromarray((rng.rand(h, w, 3) * 255).astype("uint8"))
        return (PatchRef(img, [0, 0, w, h])
                if getattr(engine, "device_preprocess", False) else img)

    h0, w0 = canvas_sizes[0]
    patch = make_patch(h0, w0)
    for bb in batch_buckets:
        for kind, fn in (("detect", engine.detect_many),
                         ("vqa", engine.vqa_many),
                         ("segment", engine.segment_many)):
            for text in texts:
                fn([patch] * bb, [text] * bb)
            if log:
                log(f"[warmup] vsm {kind} B<={bb} "
                    f"({len(texts)} prompt buckets) compiled")
    # extra canvas shapes need their normalize + pair_windows programs,
    # which are keyed by (canvas shape, same-canvas group bucket): cover
    # every group bucket traffic can form up to the wave cap (a wave with
    # 8+ patches of one image lands in the 8/16 pair_windows buckets)
    group_buckets = tuple(b for b in BATCH_BUCKETS
                          if b <= max(batch_buckets))
    for h, w in canvas_sizes[1:]:
        p = make_patch(h, w)
        for g in group_buckets:
            engine.detect_many([p] * g, [texts[0]] * g)
        if log:
            log(f"[warmup] vsm canvas {h}x{w} (group buckets "
                f"{'/'.join(str(g) for g in group_buckets)}) compiled")
