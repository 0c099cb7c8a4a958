"""On-device Hungarian matching via the auction algorithm (jittable).

The reference solves DETR's assignment with scipy's linear_sum_assignment
on the CPU, a per-step host sync (matcher.py:14,102). Round 1 replaced it
with a `pure_callback` — which gathers the [B,Q,T] cost to device 0 under
SPMD ("Involuntary full rematerialization" in the r1 multichip dryrun) and
cannot run through the axon TPU relay at all (no host callbacks).

This module solves the assignment *on device* with Bertsekas' auction
algorithm, fully vectorized over the [T, Q] value matrix and batched with
vmap, so the DETR criterion stays inside one jitted SPMD program. Targets
(persons, T <= ~100) bid for queries (objects, Q = 2304) in parallel
(Jacobi) rounds; each query takes its best bid.

A single phase from zero prices is used rather than epsilon scaling:
price carry-over between phases is unsound for asymmetric problems
(unassigned objects keep stale inflated prices, breaking the duality
bound), and with Q >> T contention is rare — rounds ~ O(T) in practice.
By eps-complementary slackness a completed auction is within T*eps of the
optimum, i.e. exact whenever the optimal assignment's margin exceeds it
(eps = 1e-6 of the value range here). A greedy completion pass bounds the
worst case if max_iters is ever hit on adversarially tied costs.

Exactness audit (tests/test_auction_realistic.py, r3): on costs produced
by `match_cost` from real OWL head outputs — 2304 grid-biased anchors,
targets sampled from the predictions incl. exact duplicates and 1e-4
perturbation near-ties, PAD columns, T up to 100 — the measured total-cost
delta vs scipy is <= 2.8e-7 of the cost range (within the T*eps bound)
with ZERO assignment disagreements over 252 targets. The loss impact of
the theoretical T*eps slack is below bf16 resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e15


def _auction_single(value: jnp.ndarray, valid: jnp.ndarray,
                    eps: jnp.ndarray, max_iters: int):
    """One assignment problem: value [T, Q] (maximize), valid [T] bool.
    Returns owner [Q] int32 (owning target per query, -1 if none)."""
    T, Q = value.shape
    value = jnp.where(valid[:, None], value.astype(jnp.float32), NEG)
    t_ids = jnp.arange(T)
    q_ids = jnp.arange(Q)

    price = jnp.zeros((Q,), jnp.float32)
    owner = jnp.full((Q,), -1, jnp.int32)
    assigned = ~valid  # invalid targets never bid

    def cond(s):
        _, _, assigned, it = s
        return jnp.logical_and(~jnp.all(assigned), it < max_iters)

    def body(s):
        price, owner, assigned, it = s
        net = value - price[None, :]                      # [T, Q]
        net = jnp.where(assigned[:, None], NEG, net)
        j_star = jnp.argmax(net, axis=1)                  # [T]
        w1 = jnp.max(net, axis=1)
        net2 = net.at[t_ids, j_star].set(NEG)
        w2 = jnp.max(net2, axis=1)
        bid = price[j_star] + (w1 - w2) + eps             # [T]
        bidding = ~assigned
        # query-wise best bid and its bidder
        onehot = jnp.logical_and(j_star[:, None] == q_ids[None, :],
                                 bidding[:, None])        # [T, Q]
        bids_mat = jnp.where(onehot, bid[:, None], NEG)
        best_bid = jnp.max(bids_mat, axis=0)              # [Q]
        winner = jnp.argmax(bids_mat, axis=0).astype(jnp.int32)
        got = best_bid > NEG / 2
        # evict previous owners of re-bid queries, then assign winners
        old = jnp.where(jnp.logical_and(got, owner >= 0), owner, T)
        assigned = assigned.at[old].set(False, mode="drop")
        owner = jnp.where(got, winner, owner)
        price = jnp.where(got, best_bid, price)
        win_t = jnp.where(got, winner, T)
        assigned = assigned.at[win_t].set(True, mode="drop")
        return price, owner, assigned, it + 1

    price, owner, assigned, _ = jax.lax.while_loop(
        cond, body, (price, owner, assigned, jnp.int32(0)))

    # Greedy completion: if max_iters capped the loop (adversarial ties),
    # give each leftover target its best unowned query. T sequential steps.
    def fill(t, carry):
        owner, assigned = carry
        free = owner < 0
        pick = jnp.argmax(jnp.where(free, value[t], NEG))
        need = jnp.logical_and(valid[t], ~assigned[t])
        owner = jnp.where(need, owner.at[pick].set(t), owner)
        assigned = jnp.where(need, assigned.at[t].set(True), assigned)
        return owner, assigned

    owner, _ = jax.lax.fori_loop(0, T, fill, (owner, assigned))
    return owner


@functools.partial(jax.jit, static_argnames=("max_iters",))
def auction_match(cost: jnp.ndarray, tgt_valid: jnp.ndarray,
                  max_iters: int = 3000) -> jnp.ndarray:
    """[B, Q, T] costs + [B, T] validity -> matched query per target [B, T]
    (undefined where invalid). Drop-in for `hungarian_match`."""
    B, Q, T = cost.shape
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    value = -jnp.swapaxes(cost, 1, 2)                          # [B, T, Q]
    vmax = jnp.max(jnp.where(tgt_valid[..., None], value, -jnp.inf),
                   axis=(1, 2))
    vmin = jnp.min(jnp.where(tgt_valid[..., None], value, jnp.inf),
                   axis=(1, 2))
    rng = jnp.where(jnp.isfinite(vmax - vmin),
                    jnp.maximum(vmax - vmin, 1e-6), 1.0)       # [B]

    def solve(value_b, valid_b, rng_b):
        owner = _auction_single(value_b, valid_b, rng_b * 1e-6, max_iters)
        # owner [Q] -> matched query per target [T]
        match = jnp.zeros((value_b.shape[0],), jnp.int32)
        safe_owner = jnp.where(owner >= 0, owner, value_b.shape[0])
        match = match.at[safe_owner].set(
            jnp.arange(value_b.shape[1], dtype=jnp.int32), mode="drop")
        return match

    return jax.vmap(solve)(value, tgt_valid, rng)
