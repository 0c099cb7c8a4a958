"""On-device auction matcher vs scipy's exact Hungarian solution.

VERDICT r1 weak #4: the pure_callback matcher gathered the cost to device 0
under SPMD and cannot run on callback-less backends. The auction matcher
(train/auction.py) must agree with scipy on generic costs and compose into
detection_criterion with loss values equal to the callback path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from vstar_tpu.train.auction import auction_match
from vstar_tpu.train.detr_loss import (PAD_COST, detection_criterion,
                                       hungarian_match)


def _scipy_match(cost, n_valid):
    B, Q, T = cost.shape
    out = np.zeros((B, T), np.int32)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[b, :, :n])
        out[b, cols] = rows.astype(np.int32)
    return out


@pytest.mark.parametrize("B,Q,T", [(3, 64, 7), (2, 128, 20), (1, 32, 1)])
def test_auction_matches_scipy(B, Q, T):
    rng = np.random.RandomState(B * 100 + Q + T)
    cost = rng.rand(B, Q, T).astype(np.float32) * 10.0
    n_valid = rng.randint(1, T + 1, size=B)
    valid = np.arange(T)[None, :] < n_valid[:, None]
    cost[:, :, :] = np.where(valid[:, None, :], cost, PAD_COST)

    got = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
    want = _scipy_match(cost, n_valid)
    for b in range(B):
        n = int(n_valid[b])
        np.testing.assert_array_equal(got[b, :n], want[b, :n])


def test_auction_total_cost_optimal_batched():
    # Even if per-pair ties differ, the total matched cost must equal the
    # optimum to high precision.
    rng = np.random.RandomState(0)
    B, Q, T = 4, 96, 12
    cost = rng.randn(B, Q, T).astype(np.float32) * 3.0
    valid = np.ones((B, T), bool)
    got = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
    for b in range(B):
        rows, cols = linear_sum_assignment(cost[b])
        opt = cost[b][rows, cols].sum()
        mine = cost[b][got[b], np.arange(T)].sum()
        assert abs(mine - opt) < 1e-3
        assert len(set(got[b].tolist())) == T  # a valid assignment


def test_auction_all_invalid_row():
    cost = np.random.RandomState(1).rand(2, 16, 4).astype(np.float32)
    valid = np.zeros((2, 4), bool)
    valid[1, :2] = True
    got = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
    want = _scipy_match(np.where(valid[:, None, :], cost, PAD_COST),
                        valid.sum(1))
    np.testing.assert_array_equal(got[1, :2], want[1, :2])


def test_detection_criterion_auction_equals_callback():
    rng = np.random.RandomState(3)
    B, Q, T = 2, 48, 5
    pred_logits = rng.randn(B, Q, 1).astype(np.float32)
    pred_boxes = jax.nn.sigmoid(
        jnp.asarray(rng.randn(B, Q, 4).astype(np.float32)))
    tgt_boxes = np.clip(rng.rand(B, T, 4).astype(np.float32), 0.1, 0.9)
    tgt_valid = np.ones((B, T), bool)
    tgt_valid[0, 3:] = False
    sample_valid = np.array([True, True])

    a = detection_criterion(jnp.asarray(pred_logits), pred_boxes,
                            jnp.asarray(tgt_boxes), jnp.asarray(tgt_valid),
                            jnp.asarray(sample_valid),
                            match_method="auction")
    c = detection_criterion(jnp.asarray(pred_logits), pred_boxes,
                            jnp.asarray(tgt_boxes), jnp.asarray(tgt_valid),
                            jnp.asarray(sample_valid),
                            match_method="callback")
    for k in a:
        np.testing.assert_allclose(float(a[k]), float(c[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_hungarian_match_default_is_auction_and_jittable():
    # the default path must compile into a single jitted program (no
    # callbacks) — jit of a wrapper must succeed and match scipy
    rng = np.random.RandomState(5)
    cost = rng.rand(2, 32, 6).astype(np.float32)
    valid = np.ones((2, 6), bool)

    @jax.jit
    def run(c, v):
        return hungarian_match(c, v)

    got = np.asarray(run(jnp.asarray(cost), jnp.asarray(valid)))
    want = _scipy_match(cost, valid.sum(1))
    np.testing.assert_array_equal(got, want)
