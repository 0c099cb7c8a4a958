"""Native C++ helper tests (compiled with g++ at test time; skip if no
toolchain)."""

import numpy as np
import pytest

from vstar_tpu.native import (bilinear_resize_native, get_lib,
                              hungarian_native, rle_decode_native)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(0)
    for q, t in [(6, 4), (30, 7), (2304, 24), (5, 5)]:
        cost = rng.rand(q, t).astype(np.float32)
        got = hungarian_native(cost)
        rows, cols = linear_sum_assignment(cost)
        want = np.zeros(t, np.int32)
        want[cols] = rows
        # optimal assignments may differ; compare total costs
        got_cost = cost[got, np.arange(t)].sum()
        want_cost = cost[want, np.arange(t)].sum()
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-5)
        assert len(set(got.tolist())) == t  # injective


def test_rle_decode_matches_python():
    from vstar_tpu.data.rle import rle_encode
    rng = np.random.RandomState(1)
    mask = (rng.rand(23, 31) > 0.5).astype(np.uint8)
    rle = rle_encode(mask)
    got = rle_decode_native(np.asarray(rle["counts"]), 23, 31)
    np.testing.assert_array_equal(got, mask)


def test_bilinear_matches_numpy():
    from vstar_tpu.data.preprocess import resize_bilinear_torch
    rng = np.random.RandomState(2)
    x = rng.rand(19, 13).astype(np.float32)
    got = bilinear_resize_native(x, 37, 41)
    want = resize_bilinear_torch(x, 37, 41)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
