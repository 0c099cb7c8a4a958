"""Splice-layout semantics tests (spec: llava_search_arch.py:95-279)."""

import jax.numpy as jnp
import numpy as np

from vstar_tpu.multimodal.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                            OBJECT_TOKEN_INDEX)
from vstar_tpu.multimodal.splicing import (apply_splice, build_layout,
                                           round_to_bucket, spliced_length,
                                           stack_layouts)

NL, NS = 8, 3  # tiny long/short token counts


def test_layout_image_long_objects_short():
    ids = [1, IMAGE_TOKEN_INDEX, 10, 11, OBJECT_TOKEN_INDEX, 12,
           OBJECT_TOKEN_INDEX, 13]
    n = spliced_length(ids, n_long=NL, n_short=NS, image_long=True,
                       objects_long=[False, False])
    assert n == 5 + NL + 2 * NS
    pad = round_to_bucket(n, 16, 64)
    lay = build_layout(ids, pad, n_long=NL, n_short=NS, image_long=True,
                       objects_long=[False, False],
                       labels=[IGNORE_INDEX] * 7 + [13])
    assert lay.length == n
    # text positions: bos at 0, '10' right after the 8 image tokens
    assert lay.text_ids[0] == 1 and not lay.is_feat[0]
    assert lay.is_feat[1:1 + NL].all()
    # image long features use bank indices 0..NL-1
    np.testing.assert_array_equal(lay.feat_idx[1:1 + NL], np.arange(NL))
    p = 1 + NL
    assert lay.text_ids[p] == 10 and lay.text_ids[p + 1] == 11
    # first object: slot 1, short range starts at NL within the slot
    slot = NL + NS
    o0 = p + 2
    np.testing.assert_array_equal(lay.feat_idx[o0:o0 + NS],
                                  slot + NL + np.arange(NS))
    # labels: IGNORE everywhere except the final answer token
    assert lay.labels[lay.length - 1] == 13
    assert (lay.labels[:lay.length - 1] == IGNORE_INDEX).all()
    assert (lay.labels[lay.length:] == IGNORE_INDEX).all()


def test_layout_image_short_objects_long():
    ids = [1, IMAGE_TOKEN_INDEX, OBJECT_TOKEN_INDEX, 5]
    lay = build_layout(ids, 32, n_long=NL, n_short=NS, image_long=False,
                       objects_long=[True])
    # image short: bank offset NL..NL+NS
    np.testing.assert_array_equal(lay.feat_idx[1:1 + NS],
                                  NL + np.arange(NS))
    slot = NL + NS
    np.testing.assert_array_equal(lay.feat_idx[1 + NS:1 + NS + NL],
                                  slot + np.arange(NL))
    assert lay.length == 2 + NS + NL


def test_apply_splice_gathers_bank():
    ids = [1, IMAGE_TOKEN_INDEX, 7]
    lay = build_layout(ids, 16, n_long=NL, n_short=NS, image_long=True)
    text_ids, feat_idx, is_feat, lens, _ = stack_layouts([lay])
    D = 4
    tok = jnp.arange(16 * D, dtype=jnp.float32).reshape(1, 16, D)
    bank = -jnp.arange((NL + NS) * 2 * D, dtype=jnp.float32).reshape(
        1, -1, D)[:, :NL + NS]
    out = apply_splice(tok, bank, jnp.asarray(feat_idx),
                       jnp.asarray(is_feat))
    # feature positions come from the bank, text positions untouched
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(tok[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 1]),
                                  np.asarray(bank[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 1 + NL]),
                                  np.asarray(tok[0, 1 + NL]))
