"""VQAEngine: host driver for the dual-projector VQA LLM.

Implements the reference VQA_LLM wrapper's API (vstar_bench_eval.py:38-165)
over jitted prefill/decode/scoring programs:
  * free_form      — greedy generation with '</s>' stopping
  * multiple_choice — all options' CE over a shared prefix cache,
    prefill + scoring fused into ONE dispatched program
  * get_object_crop — context-expanded crop preprocessing

Prompt lengths are bucketed; one compiled program per (bucket, max_new).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.config import VQALLMConfig
from ..data.preprocess import clip_resize_u8
from ..decode.sampler import greedy_decode
from ..decode.speculative import lookup_decode, speculative_decode
from ..decode.scorer import score_options
from ..models.vqa_llm import encode_feature_bank, prefill
from ..multimodal.constants import DEFAULT_IMAGE_TOKEN
from ..multimodal.conversation import CONV_TEMPLATES
from ..multimodal.splicing import build_layout, spliced_length
from ..multimodal.tokenizer import (tokenize_with_image,
                                    tokenize_with_image_and_objects)
from ..nn.llama import init_cache


def get_patch(bbox, image_width, image_height, patch_size=224,
              patch_scale=None):
    """Context-expanded crop box (vstar_bench_eval.py:49-69)."""
    ow = int(np.ceil(bbox[2]))
    oh = int(np.ceil(bbox[3]))
    cx = int(bbox[0] + bbox[2] / 2)
    cy = int(bbox[1] + bbox[3] / 2)
    if patch_scale is None:
        pw, ph = max(ow, patch_size), max(oh, patch_size)
    else:
        pw, ph = int(ow * patch_scale), int(oh * patch_scale)
    left = max(0, cx - pw // 2)
    right = min(left + pw, image_width)
    top = max(0, cy - ph // 2)
    bottom = min(top + ph, image_height)
    return [left, top, right, bottom]


class VQAEngine:
    # The trigger sentence is a fixed training template
    # (vstar_bench_eval.py:180) — a high-hit-rate draft for speculative
    # decoding of free-form answers.
    SPEC_TEMPLATE = ("Sorry, I can not answer the question. Some visual "
                     "information about the following objects is missing "
                     "or unclear:")

    def __init__(self, params, cfg: VQALLMConfig, tokenizer,
                 conv_type: str = "v1", eos_id: int = 2,
                 prompt_buckets: Tuple[int, ...] = (512, 768, 1024),
                 option_bucket: int = 64,
                 compute_dtype=jnp.bfloat16,
                 speculative_template: Optional[str] = None,
                 mesh=None, kv_int8: bool = False,
                 prompt_lookup: bool = False):
        if speculative_template is None:
            speculative_template = self.SPEC_TEMPLATE
        self._spec_template = speculative_template
        self.spec_chunk = 8
        # prompt-lookup speculative decoding for greedy free-form answers
        # (decode/speculative.lookup_decode): drafts retrieved in-graph by
        # n-gram match over prompt + generated tokens. Bit-identical to
        # greedy for any input; opt-in pending a measured win on real
        # checkpoints (acceptance is content-dependent). Overrides the
        # static template draft when enabled.
        self.prompt_lookup = prompt_lookup
        if mesh is not None:   # multi-chip serving (see search/engine.py)
            from ..core.mesh import shard_params
            params = shard_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.conv_type = conv_type
        self.eos_id = eos_id
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        self.option_bucket = option_bucket
        self.compute_dtype = compute_dtype
        # int8 KV cache: halves cache residency + decode-time KV reads
        # (the B=8 SEAL knee is KV bandwidth, BASELINE.md r2)
        self.kv_int8 = kv_int8

        # temperature/top_p are TRACED args: one compiled program serves
        # every sampling value (a static arg would compile a 20-230 s
        # relay program per distinct temperature). Only the boolean
        # `sampling` split is static, so the greedy hot path keeps its
        # argmax-only decode step.
        self._jit_free_form = jax.jit(
            self._free_form_device,
            static_argnames=("bucket", "max_new_tokens", "sampling",
                             "use_speculative", "use_lookup"))
        self._rng = jax.random.PRNGKey(0)
        self._jit_prefill = jax.jit(
            self._prefill_device, static_argnames=("bucket", "opt_room"))
        self._jit_chunk = jax.jit(
            self._chunk_decode_device,
            static_argnames=("k", "sampling"))
        # ONE program for the whole multiple-choice question: prefill +
        # every option's CE (decode/scorer.score_options reads the shared
        # prefix cache immutably, so the options cost no cache tiling).
        # The per-option program it replaces paid one dispatch + one
        # fetch PER OPTION (~10-30 ms each on the relay; 4-option V*Bench
        # burned 3 extra round trips per question).
        self._jit_mc = jax.jit(
            self._mc_device, static_argnames=("bucket", "opt_room"))

    # free-form decode stats of the LAST call: {"tokens", "forwards",
    # "tokens_per_forward"} — the speculation-acceptance metric to check
    # on real checkpoints (scripts/validate_weights.py). None before the
    # first free-form call.
    last_decode_stats = None

    def _record_decode_stats(self, ngen_rows, n_forwards: int):
        # per-row tokens per lockstep forward (greedy = 1.0; the
        # DecodeResult.n_forwards acceptance formula)
        tot = sum(ngen_rows)
        b = max(len(ngen_rows), 1)
        self.last_decode_stats = {
            "tokens": tot, "forwards": n_forwards,
            "tokens_per_forward":
                (tot - b) / max(b * n_forwards, 1) if n_forwards else 1.0,
        }

    # -- prompt helpers ------------------------------------------------------

    def _prompt(self, question: str,
                answer: Optional[str] = None) -> str:
        conv = CONV_TEMPLATES[self.conv_type]()
        conv.append_message(conv.roles[0],
                            DEFAULT_IMAGE_TOKEN + "\n" + question)
        conv.append_message(conv.roles[1], answer)
        return conv.get_prompt()

    def _tokenize(self, prompt: str) -> List[int]:
        if "<object>" in prompt:
            return tokenize_with_image_and_objects(prompt, self.tokenizer)
        return tokenize_with_image(prompt, self.tokenizer)

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt too long: {n}")

    def _layout(self, ids, image_long, objects_long, bucket):
        return build_layout(
            ids, bucket, n_long=self.cfg.image_tokens_long,
            n_short=self.cfg.image_tokens_short, image_long=image_long,
            objects_long=objects_long)

    # -- preprocessing -------------------------------------------------------

    def preprocess_image(self, image: Image.Image) -> np.ndarray:
        """-> [S, S, 3] uint8 (exact clip_preprocess PIL geometry; the
        device programs normalize — 4x less relay upload). Oracles that
        need the normalized array apply data.preprocess._normalize."""
        return clip_resize_u8(image, self.cfg.vision.image_size)

    def get_object_crop(self, image: Image.Image, bbox,
                        patch_scale: float = 1.2) -> np.ndarray:
        """Crop + resize + CLIP geometry (vstar_bench_eval.py:71-76);
        uint8, normalized on device like preprocess_image."""
        box = get_patch(bbox, image.width, image.height,
                        patch_scale=patch_scale)
        crop = image.crop(tuple(box))
        size = self.cfg.vision.image_size
        crop = crop.resize((size, size))
        return clip_resize_u8(crop, size)

    def _object_stack(self, object_crops) -> np.ndarray:
        M = self.cfg.max_objects
        size = self.cfg.vision.image_size
        # u8 by default; pre-normalized f32 crops from external callers
        # keep the f32 path (encode_feature_bank handles either dtype).
        # Empty u8 slots are black, not normalized-zero — their bank
        # entries are never gathered (see encode_feature_bank).
        dt = np.uint8
        if object_crops is not None and len(object_crops) \
                and np.asarray(object_crops[0]).dtype != np.uint8:
            dt = np.float32
        out = np.zeros((M, size, size, 3), dt)
        if object_crops is not None:
            for i, c in enumerate(object_crops[:M]):
                out[i] = c
        return out

    # -- device programs -----------------------------------------------------

    def _prefill_device(self, params, image, objects, text_ids, feat_idx,
                        is_feat, lens, *, bucket, opt_room=None):
        bank = encode_feature_bank(params, self.cfg, image, objects)
        bank = bank.astype(self.compute_dtype)
        cache = init_cache(self.cfg.llama, text_ids.shape[0],
                           bucket + (opt_room or self.option_bucket),
                           self.compute_dtype, kv_int8=self.kv_int8)
        logits, hidden, cache = prefill(params, self.cfg, bank, text_ids,
                                        feat_idx, is_feat, lens, cache,
                                        self.compute_dtype)
        last_idx = (lens - 1)[:, None, None].astype(jnp.int32)
        last_hidden = jnp.take_along_axis(hidden, last_idx, axis=1)[:, 0]
        return logits, last_hidden, cache

    def _mc_device(self, params, image, objects, text_ids, feat_idx,
                   is_feat, lens, option_ids, option_lens, *, bucket,
                   opt_room):
        """Prefill + all-options CE in one graph. option_ids [B, N, O];
        returns losses [B, N] (argmin stays host-side so padded option
        slots are simply sliced away, never compared)."""
        last_logits, _, cache = self._prefill_device(
            params, image, objects, text_ids, feat_idx, is_feat, lens,
            bucket=bucket, opt_room=opt_room)
        losses, _ = score_options(params["llama"], self.cfg.llama, cache,
                                  last_logits, option_ids, option_lens,
                                  self.compute_dtype)
        return losses

    @staticmethod
    def _opt_slots(n_opts: int) -> int:
        """Option-count bucket: N is a traced SHAPE in the fused program,
        so it must be padded to stable values or every distinct option
        count compiles its own 20-230 s relay program. Min 4 (V*Bench's
        count — warmup's 2-option call then covers live 4-option
        traffic), growing in steps of 4."""
        return max(4, ((n_opts + 3) // 4) * 4)

    def _free_form_device(self, params, image, objects, text_ids, feat_idx,
                          is_feat, lens, rng_key, draft=None,
                          temperature=0.0, top_p=1.0, *, bucket,
                          max_new_tokens, sampling=False,
                          use_speculative=False, use_lookup=False):
        bank = encode_feature_bank(params, self.cfg, image, objects)
        bank = bank.astype(self.compute_dtype)
        # the draft-and-verify loop writes chunk-wide KV at the frontier:
        # worst case needs prompt + max_new + chunk - 2 entries, so round
        # max_new UP WITH the chunk or a bucket-filling prompt at a
        # 128-multiple max_new silently clamps the last KV inserts
        # (usually free: round128 absorbs the +chunk)
        spec_room = (self.spec_chunk
                     if (use_speculative or use_lookup) else 0)
        cache_len = bucket + ((max_new_tokens + spec_room + 127)
                              // 128) * 128
        cache = init_cache(self.cfg.llama, text_ids.shape[0], cache_len,
                           self.compute_dtype, kv_int8=self.kv_int8)
        logits, hidden, cache = prefill(params, self.cfg, bank, text_ids,
                                        feat_idx, is_feat, lens, cache,
                                        self.compute_dtype)
        last_idx = (lens - 1)[:, None, None].astype(jnp.int32)
        last_hidden = jnp.take_along_axis(hidden, last_idx, axis=1)[:, 0]
        if use_lookup:
            # context = the prompt's TEXT tokens (image-feature slots
            # masked to -1 so they can never match a real token) + the
            # generated tokens, maintained inside lookup_decode
            ctx = jnp.where(is_feat, -1, text_ids).astype(jnp.int32)
            res = lookup_decode(params["llama"], self.cfg.llama, cache,
                                logits, last_hidden, ctx,
                                lens.astype(jnp.int32), max_new_tokens,
                                [self.eos_id], self.spec_chunk,
                                self.compute_dtype)
        elif use_speculative:
            res = speculative_decode(params["llama"], self.cfg.llama, cache,
                                     logits, last_hidden, draft,
                                     max_new_tokens, [self.eos_id],
                                     self.spec_chunk, self.compute_dtype)
        else:
            res = greedy_decode(
                params["llama"], self.cfg.llama, cache, logits,
                last_hidden, max_new_tokens, [self.eos_id],
                self.compute_dtype,
                temperature=temperature if sampling else 0.0,
                top_p=top_p if sampling else None, rng_key=rng_key)
        # ONE packed [B, 2 + L] int32 result: [ngen, n_forwards, tokens].
        # Separate (tokens, ngen, nfwd) outputs cost one device->host
        # fetch EACH (~5-15 ms per round trip on the relay; free_form_many
        # additionally fetched each row's tokens separately).
        B = res.tokens.shape[0]
        return jnp.concatenate(
            [res.num_generated.astype(jnp.int32).reshape(B, 1),
             jnp.broadcast_to(jnp.asarray(res.n_forwards, jnp.int32),
                              (B, 1)),
             res.tokens.astype(jnp.int32)], axis=1)

    def _chunk_decode_device(self, params, cache, logits, hidden,
                             rng_key=None, temperature=0.0, top_p=1.0, *,
                             k, sampling=False):
        """k tokens (greedy, or sampled when sampling=True) + the
        continuation state (logits/hidden/cache positioned after the k-th
        token) for host-chunked decoding. temperature/top_p are traced."""
        from ..models.vqa_llm import decode_step
        res = greedy_decode(params["llama"], self.cfg.llama, cache, logits,
                            hidden, k, [self.eos_id], self.compute_dtype,
                            temperature=temperature if sampling else 0.0,
                            top_p=top_p if sampling else None,
                            rng_key=rng_key)
        logits2, hidden2, cache2 = decode_step(
            params, self.cfg, res.cache, res.tokens[:, k - 1:k],
            self.compute_dtype)
        return res.tokens, res.num_generated, logits2, hidden2, cache2

    def _free_form_keywords(self, image, question, object_crops,
                            images_long, objects_long, max_new_tokens,
                            stop_keywords, chunk: int = 8,
                            temperature: float = 0.0, top_p=None) -> str:
        """Decode (greedy, or sampled when temperature > 0) with
        multi-token keyword stopping (KeywordsStoppingCriteria semantics,
        mm_utils.py:123-148): decode in device chunks, check the decoded
        text on the host, stop at the first keyword and strip it
        (vstar_bench_eval.py:104-113)."""
        prompt = self._prompt(question)
        ids = self._tokenize(prompt)
        image_long = True if images_long is None else bool(images_long[0])
        n = spliced_length(ids, n_long=self.cfg.image_tokens_long,
                           n_short=self.cfg.image_tokens_short,
                           image_long=image_long, objects_long=objects_long)
        bucket = self._bucket(n)
        lay = self._layout(ids, image_long, objects_long, bucket)
        img = jnp.asarray(self.preprocess_image(image)[None])
        objs = jnp.asarray(self._object_stack(object_crops)[None])
        room = ((max_new_tokens + chunk + 127) // 128) * 128
        logits, hidden, cache = self._jit_prefill(
            self.params, img, objs, jnp.asarray(lay.text_ids[None]),
            jnp.asarray(lay.feat_idx[None]), jnp.asarray(lay.is_feat[None]),
            jnp.asarray([lay.length], jnp.int32), bucket=bucket,
            opt_room=room)

        toks: List[int] = []
        while len(toks) < max_new_tokens:
            k = min(chunk, max_new_tokens - len(toks))
            self._rng, sub = jax.random.split(self._rng)
            tokens, ngen, logits, hidden, cache = self._jit_chunk(
                self.params, cache, logits, hidden, sub,
                float(temperature), 1.0 if top_p is None else float(top_p),
                k=k, sampling=temperature > 0.0)
            got = [int(t) for t in np.asarray(tokens[0, :int(ngen[0])])]
            toks.extend(got)
            hit_eos = got and got[-1] == self.eos_id
            text = self.tokenizer.decode(
                [t for t in toks if t != self.eos_id],
                skip_special_tokens=True).strip()
            stop_kw = next((kw for kw in stop_keywords if kw in text), None)
            if stop_kw is not None:
                return text.split(stop_kw)[0].strip()
            if hit_eos:
                return text
        return self.tokenizer.decode(
            [t for t in toks if t != self.eos_id],
            skip_special_tokens=True).strip()

    # -- public API ----------------------------------------------------------

    def free_form(self, image: Image.Image, question: str,
                  object_crops=None, images_long=None, objects_long=None,
                  max_new_tokens: int = 200, temperature: float = 0.0,
                  top_p=None, stop_keywords: Optional[Sequence[str]] = None
                  ) -> str:
        """Greedy free-form answer (vstar_bench_eval.py:78-114).
        `image` must already be expand2square'd by the caller, as in the
        reference loop (vstar_bench_eval.py:192).

        stop_keywords: optional decoded-text stop strings beyond eos
        (multi-token KeywordsStoppingCriteria generality)."""
        if stop_keywords:
            return self._free_form_keywords(
                image, question, object_crops, images_long, objects_long,
                max_new_tokens, stop_keywords, temperature=temperature,
                top_p=top_p)
        prompt = self._prompt(question)
        ids = self._tokenize(prompt)
        image_long = True if images_long is None else bool(images_long[0])
        n = spliced_length(ids, n_long=self.cfg.image_tokens_long,
                           n_short=self.cfg.image_tokens_short,
                           image_long=image_long, objects_long=objects_long)
        bucket = self._bucket(n)
        lay = self._layout(ids, image_long, objects_long, bucket)

        img = jnp.asarray(self.preprocess_image(image)[None])
        objs = jnp.asarray(self._object_stack(object_crops)[None])
        self._rng, sub = jax.random.split(self._rng)
        draft = None
        use_lookup = temperature <= 0.0 and self.prompt_lookup
        use_spec = (not use_lookup and temperature <= 0.0
                    and self._spec_template is not None)
        if use_spec:
            t_ids = self.tokenizer(self._spec_template).input_ids
            if t_ids and t_ids[0] == self.tokenizer.bos_token_id:
                t_ids = t_ids[1:]
            row = np.full(max_new_tokens + self.spec_chunk, self.eos_id,
                          np.int32)
            row[:min(len(t_ids), len(row))] = t_ids[:len(row)]
            draft = jnp.asarray(row[None])
        packed = np.asarray(self._jit_free_form(
            self.params, img, objs, jnp.asarray(lay.text_ids[None]),
            jnp.asarray(lay.feat_idx[None]), jnp.asarray(lay.is_feat[None]),
            jnp.asarray([lay.length], jnp.int32), sub, draft,
            float(temperature), 1.0 if top_p is None else float(top_p),
            bucket=bucket, max_new_tokens=max_new_tokens,
            sampling=temperature > 0.0, use_speculative=use_spec,
            use_lookup=use_lookup))          # single fetch
        n_out = int(packed[0, 0])
        self._record_decode_stats([n_out], int(packed[0, 1]))
        toks = [int(t) for t in packed[0, 2:2 + n_out]]
        text = self.tokenizer.decode(toks, skip_special_tokens=True).strip()
        return text

    BATCH_BUCKETS = (1, 2, 4, 8, 16)

    def _batch_bucket(self, n: int) -> int:
        for b in self.BATCH_BUCKETS:
            if n <= b:
                return b
        return self.BATCH_BUCKETS[-1]

    def free_form_many(self, images, questions, object_crops_list=None,
                       images_long=None, objects_long=None,
                       max_new_tokens: int = 200):
        """Batched free_form across images (one device batch; workload 4).
        object_crops_list / images_long / objects_long are per-row lists
        (None entries use the defaults). Waves larger than the biggest
        batch bucket are split and concatenated."""
        n = len(images)
        max_bb = self.BATCH_BUCKETS[-1]
        if n > max_bb:
            def sl(x, a, b):
                return None if x is None else x[a:b]
            out = []
            for a in range(0, n, max_bb):
                b = min(a + max_bb, n)
                out.extend(self.free_form_many(
                    images[a:b], questions[a:b],
                    sl(object_crops_list, a, b), sl(images_long, a, b),
                    sl(objects_long, a, b), max_new_tokens))
            return out
        lays, imgs, objs = [], [], []
        for i in range(n):
            il = True if images_long is None or images_long[i] is None \
                else bool(images_long[i][0])
            ol = None if objects_long is None else objects_long[i]
            prompt = self._prompt(questions[i])
            ids = self._tokenize(prompt)
            lays.append((ids, il, ol))
            imgs.append(self.preprocess_image(images[i]))
            crops = None if object_crops_list is None \
                else object_crops_list[i]
            objs.append(self._object_stack(crops))
        lengths = [spliced_length(ids, n_long=self.cfg.image_tokens_long,
                                  n_short=self.cfg.image_tokens_short,
                                  image_long=il, objects_long=ol)
                   for ids, il, ol in lays]
        bucket = self._bucket(max(lengths))
        built = [self._layout(ids, il, ol, bucket) for ids, il, ol in lays]

        bb = self._batch_bucket(n)
        for _ in range(bb - n):
            built.append(built[0])
            imgs.append(imgs[0])
            objs.append(objs[0])

        self._rng, sub = jax.random.split(self._rng)
        draft = None
        use_lookup = self.prompt_lookup
        use_spec = not use_lookup and self._spec_template is not None
        if use_spec:
            t_ids = self.tokenizer(self._spec_template).input_ids
            if t_ids and t_ids[0] == self.tokenizer.bos_token_id:
                t_ids = t_ids[1:]
            row = np.full(max_new_tokens + self.spec_chunk, self.eos_id,
                          np.int32)
            row[:min(len(t_ids), len(row))] = t_ids[:len(row)]
            draft = jnp.asarray(np.tile(row[None], (bb, 1)))
        packed = np.asarray(self._jit_free_form(
            self.params, jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(objs)),
            jnp.asarray(np.stack([l.text_ids for l in built])),
            jnp.asarray(np.stack([l.feat_idx for l in built])),
            jnp.asarray(np.stack([l.is_feat for l in built])),
            jnp.asarray([l.length for l in built], jnp.int32), sub, draft,
            bucket=bucket, max_new_tokens=max_new_tokens,
            use_speculative=use_spec, use_lookup=use_lookup))
        # single fetch for the whole wave (was 2 + one PER ROW before)
        self._record_decode_stats(
            [int(g) for g in packed[:n, 0]], int(packed[0, 1]))
        out = []
        for b in range(n):
            n_out = int(packed[b, 0])
            toks = [int(t) for t in packed[b, 2:2 + n_out]]
            out.append(self.tokenizer.decode(
                toks, skip_special_tokens=True).strip())
        return out

    def multiple_choice_many(self, images, questions, options_list,
                             object_crops_list=None, images_long=None,
                             objects_long=None):
        """Batched option scoring across images (all rows must have the
        same option count, as V*Bench does)."""
        n = len(images)
        max_bb = self.BATCH_BUCKETS[-1]
        if n > max_bb:
            def sl(x, a, b):
                return None if x is None else x[a:b]
            out = []
            for a in range(0, n, max_bb):
                b = min(a + max_bb, n)
                out.extend(self.multiple_choice_many(
                    images[a:b], questions[a:b], options_list[a:b],
                    sl(object_crops_list, a, b), sl(images_long, a, b),
                    sl(objects_long, a, b)))
            return out
        n_opts = len(options_list[0])
        assert all(len(o) == n_opts for o in options_list)
        lays, imgs, objs, q_ids_list, flags = [], [], [], [], []
        for i in range(n):
            il = True if images_long is None or images_long[i] is None \
                else bool(images_long[i][0])
            ol = None if objects_long is None else objects_long[i]
            prompt = self._prompt(questions[i])
            ids = self._tokenize(prompt)
            q_ids_list.append(ids)
            flags.append((il, ol))
            imgs.append(self.preprocess_image(images[i]))
            crops = None if object_crops_list is None \
                else object_crops_list[i]
            objs.append(self._object_stack(crops))
        lengths = [spliced_length(ids, n_long=self.cfg.image_tokens_long,
                                  n_short=self.cfg.image_tokens_short,
                                  image_long=f[0], objects_long=f[1])
                   for ids, f in zip(q_ids_list, flags)]
        bucket = self._bucket(max(lengths))
        built = [self._layout(ids, f[0], f[1], bucket)
                 for ids, f in zip(q_ids_list, flags)]
        bb = self._batch_bucket(n)
        for _ in range(bb - n):
            built.append(built[0])
            imgs.append(imgs[0])
            objs.append(objs[0])

        opt_ids_all = [[self._tokenize(
            self._prompt(questions[b], options_list[b][opt_i])
        )[len(q_ids_list[b]):] for opt_i in range(n_opts)]
            for b in range(n)]
        O = self._opt_room(max(len(o) for row in opt_ids_all for o in row))

        N = self._opt_slots(n_opts)
        opt_arr = np.zeros((bb, N, O), np.int32)
        opt_lens = np.ones((bb, N), np.int32)   # padded slots score junk
        for b in range(n):                      # ... and are sliced away
            for oi in range(n_opts):
                ids = opt_ids_all[b][oi]
                opt_arr[b, oi, :len(ids)] = ids
                opt_lens[b, oi] = len(ids)
        losses = np.asarray(self._jit_mc(
            self.params, jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(objs)),
            jnp.asarray(np.stack([l.text_ids for l in built])),
            jnp.asarray(np.stack([l.feat_idx for l in built])),
            jnp.asarray(np.stack([l.is_feat for l in built])),
            jnp.asarray([l.length for l in built], jnp.int32),
            jnp.asarray(opt_arr), jnp.asarray(opt_lens),
            bucket=bucket, opt_room=O))         # ONE dispatch, ONE fetch
        return [int(np.argmin(losses[b, :n_opts])) for b in range(n)]

    def _opt_room(self, max_len: int) -> int:
        """Option bucket, grown in 16-token steps for long options (the
        reference handles any option length, vstar_bench_eval.py:140-161;
        r1 hard-asserted and crashed)."""
        if max_len <= self.option_bucket:
            return self.option_bucket
        return ((max_len + 15) // 16) * 16

    def multiple_choice(self, image: Image.Image, question: str,
                        options: Sequence[str], object_crops=None,
                        images_long=None, objects_long=None) -> int:
        """Option with minimum mean CE (vstar_bench_eval.py:116-165).
        One fused-program dispatch via the batched path (B=1 row)."""
        return self.multiple_choice_many(
            [image], [question], [options],
            None if object_crops is None else [object_crops],
            None if images_long is None else [images_long],
            None if objects_long is None else [objects_long])[0]


def warmup_vqa_engine(engine: VQAEngine, image_size: int = 256,
                      batch_buckets=(1, 2, 4, 8),
                      max_new_tokens: int = 200, log=print,
                      sampling: bool = False):
    """Pre-compile the free-form and option-scoring programs per
    (batch-bucket x PROMPT-bucket) so no live request stalls on a
    20-230 s remote compile (serve.server --warmup). max_new_tokens is a
    STATIC jit arg — it must equal what live traffic passes (the
    free_form default is 200); option scoring beyond the default
    option_bucket (very long options) still compiles lazily."""
    import numpy as np
    from PIL import Image

    from ..search.batched import _filler_for_bucket

    def length_of(q):
        ids = engine._tokenize(engine._prompt(q))
        from ..multimodal.splicing import spliced_length
        return spliced_length(ids, n_long=engine.cfg.image_tokens_long,
                              n_short=engine.cfg.image_tokens_short,
                              image_long=True)

    texts = ["what is this ?"]
    lo = engine.prompt_buckets[0]
    for b in engine.prompt_buckets[1:]:
        t = _filler_for_bucket(length_of, lo, b)
        if t is not None:
            texts.append(t)
        elif log:  # no-silent-caps: this bucket stays cold
            log(f"[warmup] vqa prompt bucket {b} unreachable by filler "
                f"text — first live prompt in ({lo}, {b}] will compile")
        lo = b

    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(image_size, image_size, 3)
                           * 255).astype("uint8"))
    opts = ["a thing", "another"]
    for bb in batch_buckets:
        for q in texts:
            if hasattr(engine, "free_form_many"):
                engine.free_form_many([img] * bb, [q] * bb,
                                      max_new_tokens=max_new_tokens)
                engine.multiple_choice_many([img] * bb, [q] * bb,
                                            [opts] * bb)
            else:
                engine.free_form(img, q, max_new_tokens=max_new_tokens)
                engine.multiple_choice(img, q, opts)
        if log:
            log(f"[warmup] vqa B<={bb} ({len(texts)} prompt buckets) "
                f"compiled")
        if not hasattr(engine, "free_form_many"):
            break
    if sampling:
        # The sampled decode program (sampling=True) is shared by every
        # temperature/top_p value (traced args) — one B=1 compile covers
        # it. Off by default: every current serving/eval surface decodes
        # greedily (the HTTP schema has no temperature field), so this
        # compile would only add startup cost. Flip it on when exposing a
        # sampled endpoint.
        engine.free_form(img, texts[0], max_new_tokens=max_new_tokens,
                         temperature=0.7, top_p=0.9)
        if log:
            log("[warmup] vqa sampled-decode program compiled (all "
                "temperature/top_p values share it)")
