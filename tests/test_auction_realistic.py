"""Auction-vs-exact audit on REALISTIC DETR costs (VERDICT r2 weak #4):
cost tensors produced by `match_cost` from actual OWL head outputs — 2304
grid-biased anchors, near-duplicate targets sampled from the predictions,
PAD_COST columns, T up to 100 — not benign uniform-random matrices.

Exactness contract documented in train/auction.py: a completed auction is
within T*eps of the optimal total cost (eps = 1e-6 of the value range).
This audit asserts that bound and additionally reports the raw
disagreement (equal-cost tie swaps are legal)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from vstar_tpu.core.config import OwlHeadConfig
from vstar_tpu.nn.owl_heads import init_owl_head_params, owl_detect
from vstar_tpu.train.auction import auction_match
from vstar_tpu.train.detr_loss import match_cost

CFG = OwlHeadConfig()
GRID = 48  # the production 768/16 OWL grid -> 2304 anchors


def _head_outputs(seed):
    """Grid-biased predictions from the real head MLPs on a random
    feature map — the structure (anchor clusters, near-ties) the uniform
    test can't produce."""
    key = jax.random.PRNGKey(seed)
    params = init_owl_head_params(key, CFG)
    fmap = jax.random.normal(key, (1, GRID, GRID, CFG.vision_dim)) * 0.5
    q = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (1, 1, CFG.query_dim))
    logits, boxes = owl_detect(params, CFG, fmap, q)
    return np.asarray(logits[0]), np.asarray(boxes[0])


def _targets(boxes, T, n_valid, seed):
    """Targets sampled FROM the predictions (near-duplicate anchors),
    including exact duplicates and off-grid noise."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(boxes.shape[0], size=T, replace=False)
    tgt = boxes[idx].copy()
    # a third get tiny perturbations (near-ties between 2+ anchors)
    k = T // 3
    tgt[:k] += rng.randn(k, 4).astype(np.float32) * 1e-4
    # a couple of exact duplicates
    if T >= 4:
        tgt[-1] = tgt[0]
        tgt[-2] = tgt[1]
    tgt = np.clip(tgt, 1e-4, 1.0)
    valid = np.arange(T) < n_valid
    return tgt.astype(np.float32), valid


@pytest.mark.parametrize("T,n_valid,seed", [
    (8, 8, 0), (32, 25, 1), (100, 100, 2), (100, 60, 3)])
def test_auction_exactness_on_real_costs(T, n_valid, seed):
    logits, boxes = _head_outputs(seed)
    tgt, valid = _targets(boxes, T, n_valid, seed + 10)
    cost = np.asarray(match_cost(jnp.asarray(logits), jnp.asarray(boxes),
                                 jnp.asarray(tgt), jnp.asarray(valid)),
                      np.float32)[None]          # [1, Q, T]
    got = np.asarray(auction_match(jnp.asarray(cost),
                                   jnp.asarray(valid[None])))[0]

    c = cost[0][:, :n_valid]
    rows, cols = linear_sum_assignment(c)
    opt = c[rows, cols].sum()
    mine = c[got[:n_valid], np.arange(n_valid)].sum()

    # a valid assignment: distinct queries per valid target
    assert len(set(got[:n_valid].tolist())) == n_valid
    # documented bound: T * eps, eps = 1e-6 * value range
    rng_v = float(c.min(initial=np.inf) * -1 + c.max())  # cost range
    bound = n_valid * rng_v * 1e-6 + 1e-4
    assert mine - opt <= bound, (mine, opt, mine - opt, bound)


def test_auction_exactness_report():
    """Aggregate audit over many seeds: total-cost delta must stay within
    the documented bound everywhere; the tie-swap disagreement rate is
    reported (informational — equal-cost swaps are legal)."""
    deltas, disagree, total = [], 0, 0
    for seed in range(6):
        T = [8, 16, 40, 100, 64, 24][seed]
        logits, boxes = _head_outputs(seed + 20)
        tgt, valid = _targets(boxes, T, T, seed + 30)
        cost = np.asarray(match_cost(jnp.asarray(logits),
                                     jnp.asarray(boxes), jnp.asarray(tgt),
                                     jnp.asarray(valid)), np.float32)[None]
        got = np.asarray(auction_match(jnp.asarray(cost),
                                       jnp.asarray(valid[None])))[0]
        c = cost[0]
        rows, cols = linear_sum_assignment(c)
        opt = c[rows, cols].sum()
        mine = c[got, np.arange(T)].sum()
        want = np.zeros(T, np.int64)
        want[cols] = rows
        disagree += int((want != got).sum())
        total += T
        rng_v = float(c.max() - c.min())
        deltas.append((mine - opt) / max(rng_v, 1e-9))
    print(f"auction audit: max rel cost delta {max(deltas):.2e}, "
          f"tie-swap rate {disagree}/{total}")
    assert max(deltas) <= 100 * 1e-6 + 1e-7   # T*eps in range units
