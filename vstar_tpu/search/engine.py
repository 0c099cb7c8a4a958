"""VSMEngine: host-side driver implementing the VSMClient protocol over the
jitted VSM pipeline.

Mirrors the reference VSM wrapper (visual_search.py:142-225): builds the
vicuna-v1 prompt with <im_start><image><im_end>, preprocesses the patch for
both towers (CLIP 224², OWL-ViT 768²), runs one jitted generate+heads pass,
and post-processes per mode. Prompt lengths are bucketed so only a handful
of program shapes ever compile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VSMConfig
from ..data.preprocess import (clip_resize_u8, expand2square,
                               owlvit_resize_u8, resize_bilinear_torch)
from ..models.vsm import VSMOutput, vsm_generate
from ..multimodal.constants import (DEFAULT_IM_END_TOKEN,
                                    DEFAULT_IM_START_TOKEN,
                                    DEFAULT_IMAGE_TOKEN)
from ..multimodal.conversation import CONV_TEMPLATES
from ..multimodal.splicing import build_layout
from ..multimodal.tokenizer import tokenize_with_image


class VSMEngine:
    """Three inference modes ('detection', 'vqa', 'segmentation') against
    one compiled program per prompt bucket."""

    def __init__(self, params, cfg: VSMConfig, tokenizer,
                 loc_token_id: int, eos_id: int = 2,
                 conv_type: str = "llava_v1", use_mm_start_end: bool = True,
                 max_new_tokens: int = 100,
                 prompt_buckets: Tuple[int, ...] = (384, 512),
                 compute_dtype=jnp.bfloat16,
                 speculative_template: Optional[str] = "Sure, [LOC].",
                 mesh=None, kv_int8: bool = False):
        # mesh: shard the model over a jax.sharding.Mesh for multi-chip
        # serving (TP/FSDP per core/mesh.py rules); XLA inserts the ICI
        # collectives. The reference's multi-GPU story is HF device_map
        # layering (builder.py:27) — this runs every layer on all chips.
        if mesh is not None:
            from ..core.mesh import shard_params
            params = shard_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.loc_token_id = loc_token_id
        self.eos_id = eos_id
        self.conv_type = conv_type
        self.use_mm_start_end = use_mm_start_end
        self.max_new_tokens = max_new_tokens
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        self.compute_dtype = compute_dtype
        self.kv_int8 = kv_int8
        self.spec_chunk = 8
        self._draft_row = None
        if speculative_template:
            ids = tokenizer(speculative_template).input_ids
            if ids and ids[0] == tokenizer.bos_token_id:
                ids = ids[1:]
            ids = list(ids) + [eos_id]
            row = np.full(max_new_tokens + self.spec_chunk, eos_id,
                          np.int32)
            row[:min(len(ids), len(row))] = ids[:len(row)]
            self._draft_row = row

        self._jit_generate = jax.jit(
            functools.partial(vsm_generate, kv_int8=kv_int8),
            static_argnames=("cfg", "loc_token_id", "max_new_tokens",
                             "eos_id", "cache_len", "compute_dtype",
                             "spec_chunk", "kv_int8"))

    # -- prompt/layout -----------------------------------------------------

    def _build_prompt(self, question: str) -> str:
        conv = CONV_TEMPLATES[self.conv_type]()
        prompt = DEFAULT_IMAGE_TOKEN + "\n" + question
        if self.use_mm_start_end:
            prompt = prompt.replace(
                DEFAULT_IMAGE_TOKEN,
                DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                + DEFAULT_IM_END_TOKEN)
        conv.append_message(conv.roles[0], prompt)
        conv.append_message(conv.roles[1], None)
        return conv.get_prompt()

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt too long: {n} > {self.prompt_buckets[-1]}")

    # -- core --------------------------------------------------------------

    def _run(self, image, question: str) -> Tuple[VSMOutput, Tuple[int, int]]:
        prompt = self._build_prompt(question)
        ids = tokenize_with_image(prompt, self.tokenizer)

        n_img = self.cfg.image_tokens
        lay_len = len(ids) - 1 + n_img
        bucket = self._bucket(lay_len)
        lay = build_layout(ids, bucket, n_long=n_img, n_short=0,
                           image_long=True)

        # u8 upload (exact PIL geometry), normalized inside vsm_generate
        sq, _, _ = expand2square(image)
        img_clip = clip_resize_u8(sq, self.cfg.vision.image_size)[None]
        img_owl = owlvit_resize_u8(image,
                                   self.cfg.owl_vision.image_size)[None]

        draft = None
        if self._draft_row is not None:
            draft = jnp.asarray(self._draft_row[None])
        out = self._jit_generate(
            self.params, self.cfg, jnp.asarray(img_clip),
            jnp.asarray(img_owl), jnp.asarray(lay.text_ids[None]),
            jnp.asarray(lay.feat_idx[None]), jnp.asarray(lay.is_feat[None]),
            jnp.asarray([lay.length], jnp.int32),
            loc_token_id=self.loc_token_id,
            max_new_tokens=self.max_new_tokens, eos_id=self.eos_id,
            cache_len=bucket + _round128(self.max_new_tokens
                                         + self.spec_chunk),
            compute_dtype=self.compute_dtype, draft_ids=draft,
            spec_chunk=self.spec_chunk)
        return out, (image.height, image.width)

    def _heatmap(self, out: VSMOutput, size: Tuple[int, int]) -> np.ndarray:
        """Low-res mask logits -> original patch size -> clamp(min=0),
        matching interpolate-then-clamp (VSM.py:534-537 +
        visual_search.py:210,224)."""
        if not bool(out.loc_valid[0]):
            return np.zeros(size, np.float32)
        low = np.asarray(out.mask_logits[0], np.float32)
        resized = resize_bilinear_torch(low, size[0], size[1])
        return np.clip(resized, 0.0, None)

    # -- VSMClient protocol ------------------------------------------------

    def detect(self, image, name: str):
        q = f"Please locate the {name} in this image."
        out, size = self._run(image, q)
        if not bool(out.loc_valid[0]):
            return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                    np.zeros(size, np.float32))
        boxes = np.asarray(out.det_boxes[0], np.float32)
        logits = 1.0 / (1.0 + np.exp(-np.asarray(out.det_logits[0],
                                                 np.float32)))
        return boxes, logits, self._heatmap(out, size)

    def vqa(self, image, question: str) -> str:
        out, _ = self._run(image, question)
        n = int(out.num_generated[0])
        toks = [int(t) for t in np.asarray(out.tokens[0, :n])]
        text = self.tokenizer.decode(toks, skip_special_tokens=True)
        return text.replace("\n", "").replace("  ", " ").strip()

    def segment(self, image, phrase: str) -> np.ndarray:
        q = f"Please locate the {phrase} in this image."
        out, size = self._run(image, q)
        return self._heatmap(out, size)


def _round128(n: int) -> int:
    return ((n + 127) // 128) * 128
