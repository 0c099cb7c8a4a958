"""Static-layout multimodal token splicing.

The reference splices vision features into the token stream with per-row
Python loops over dynamic shapes (llava_search_arch.py:95-279) — hostile to
XLA. Here the splice is split into:

  * HOST: `build_layout` walks the sentinel token ids once and produces a
    static gather map (text ids, feature-bank indices, feature flags,
    labels) padded to a bucketed length.
  * DEVICE: `apply_splice` materializes the embedding sequence with one
    `take_along_axis` gather from a per-row feature bank — fully jittable,
    static shapes, no control flow.

Feature-bank layout per row: slot 0 = the image, slots 1..max_objects =
object crops; each slot stores [long(256) ; short(32)] projected features.
The image/object long-short switching (llava_search_arch.py:149-153,
195-199) is then just a choice of index ranges, made on the host.

Semantics match the reference exactly: each <image> sentinel expands to
256 long or 32 short tokens, each <object> to 32 short or 256 long;
spliced feature positions get IGNORE_INDEX labels; right padding.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, OBJECT_TOKEN_INDEX


@dataclasses.dataclass
class SpliceLayout:
    """Per-row gather map (host numpy, padded to `pad_len`)."""

    text_ids: np.ndarray      # int32 [S]; 0 at feature/pad positions
    feat_idx: np.ndarray      # int32 [S]; bank index at feature positions
    is_feat: np.ndarray       # bool  [S]
    length: int               # valid length
    labels: Optional[np.ndarray] = None   # int32 [S] (IGNORE at feats/pad)


def bank_slot_size(n_long: int, n_short: int) -> int:
    return n_long + n_short


def build_layout(input_ids: Sequence[int], pad_len: int, *,
                 n_long: int = 256, n_short: int = 32,
                 image_long: bool = True,
                 objects_long: Optional[Sequence[bool]] = None,
                 labels: Optional[Sequence[int]] = None) -> SpliceLayout:
    """Expand sentinel ids into a static gather map.

    input_ids: token ids with IMAGE/OBJECT sentinels (negative).
    image_long: <image> -> 256 long tokens, else 32 perceiver latents
      (inference heuristic at vstar_bench_eval.py:231-236).
    objects_long: per-<object> flags; True -> 256 long tokens.
    """
    slot = bank_slot_size(n_long, n_short)
    text_ids = np.zeros(pad_len, np.int32)
    feat_idx = np.zeros(pad_len, np.int32)
    is_feat = np.zeros(pad_len, bool)
    out_labels = np.full(pad_len, IGNORE_INDEX, np.int32) \
        if labels is not None else None

    p = 0
    obj_i = 0
    for j, tok in enumerate(input_ids):
        if tok == IMAGE_TOKEN_INDEX:
            base = 0
            n = n_long if image_long else n_short
            off = 0 if image_long else n_long
            assert p + n <= pad_len, "sequence bucket too small"
            feat_idx[p:p + n] = base + off + np.arange(n)
            is_feat[p:p + n] = True
            p += n
        elif tok == OBJECT_TOKEN_INDEX:
            long = bool(objects_long[obj_i]) if objects_long is not None \
                else False
            base = (1 + obj_i) * slot
            n = n_long if long else n_short
            off = 0 if long else n_long
            assert p + n <= pad_len, "sequence bucket too small"
            feat_idx[p:p + n] = base + off + np.arange(n)
            is_feat[p:p + n] = True
            obj_i += 1
            p += n
        else:
            assert p < pad_len, "sequence bucket too small"
            text_ids[p] = tok
            if labels is not None:
                out_labels[p] = labels[j]
            p += 1
    return SpliceLayout(text_ids=text_ids, feat_idx=feat_idx,
                        is_feat=is_feat, length=p, labels=out_labels)


def spliced_length(input_ids: Sequence[int], *, n_long: int = 256,
                   n_short: int = 32, image_long: bool = True,
                   objects_long: Optional[Sequence[bool]] = None) -> int:
    """Final sequence length after sentinel expansion (for bucket choice)."""
    n = 0
    obj_i = 0
    for tok in input_ids:
        if tok == IMAGE_TOKEN_INDEX:
            n += n_long if image_long else n_short
        elif tok == OBJECT_TOKEN_INDEX:
            long = bool(objects_long[obj_i]) if objects_long is not None \
                else False
            n += n_long if long else n_short
            obj_i += 1
        else:
            n += 1
    return n


def round_to_bucket(n: int, granularity: int = 128,
                    max_len: int = 2048) -> int:
    b = ((n + granularity - 1) // granularity) * granularity
    assert b <= max_len, f"sequence {n} exceeds context {max_len}"
    return b


def stack_layouts(layouts: List[SpliceLayout]
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                             Optional[np.ndarray]]:
    """Stack per-row layouts (same pad_len) into batch arrays."""
    text_ids = np.stack([l.text_ids for l in layouts])
    feat_idx = np.stack([l.feat_idx for l in layouts])
    is_feat = np.stack([l.is_feat for l in layouts])
    lens = np.asarray([l.length for l in layouts], np.int32)
    labels = None
    if layouts[0].labels is not None:
        labels = np.stack([l.labels for l in layouts])
    return text_ids, feat_idx, is_feat, lens, labels


def apply_splice(token_embeds: jnp.ndarray, feat_bank: jnp.ndarray,
                 feat_idx: jnp.ndarray, is_feat: jnp.ndarray) -> jnp.ndarray:
    """DEVICE: one gather + select.

    token_embeds: [B, S, D] embeddings of text_ids
    feat_bank:    [B, F, D] per-row projected vision features
    feat_idx:     [B, S] int32 indices into the bank
    is_feat:      [B, S] bool
    """
    feats = jnp.take_along_axis(
        feat_bank, feat_idx[..., None].astype(jnp.int32), axis=1)
    return jnp.where(is_feat[..., None], feats.astype(token_embeds.dtype),
                     token_embeds)
