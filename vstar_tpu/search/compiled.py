"""The compiled search: guided-search policy state and transitions on
device, so a whole detect-path (target-cue) search runs as ONE dispatched
program instead of one host round-trip per step.

This is the BASELINE.json north star ("re-express the recursive guided
search as a bucketed device loop over padded crop batches so the whole
search compiles"). The reference's control flow (visual_search.py:390-516)
is a host recursion popping a PriorityQueue and calling the VSM per patch;
here the queue, the path record, the accept/threshold tests, the 2x2/4x1
splits and the ancestor-weighted sub-patch scores are all jax arrays and
jittable transitions:

  * `policy_state_init` / `PolicyState` — fixed-capacity queue + path
    arrays (slot allocation is monotonic, pop = max score with
    min-insertion-order tie-break, exactly heapq's (-score, counter)).
  * `injected_step` — one policy transition driven by EXTERNALLY provided
    VSM outputs (det boxes/logits + full-res heatmap). One dispatch per
    step; used by the parity tests to prove the device policy traverses
    byte-identically to the reference under a shared oracle, and usable
    with any VSMClient.
  * `fused_search` — the production program: a `lax.while_loop` that pops
    a patch, extracts both tower windows from the device-resident canvas
    (kernels/image_ops.pair_windows math), runs the full VSM
    (towers + prefill + speculative decode + [LOC] heads) and applies the
    policy transition — N steps per dispatch, exiting to the host only on
    accept, queue-exhaustion, or path-capacity growth. Context-cue
    events run IN-PROGRAM too: the loop multiplexes ONE vsm_generate
    between three stacked prompt layouts (detect / context question /
    context segment), decodes the context ANSWER before exiting, and the
    host — whose only job is the noun-chunk phrase parse — re-enters once
    with the segment layout; that dispatch pushes the cue and keeps
    searching. One dispatch + one fetch per context event (r3 paid 3+
    engine waves and ~8 relay round trips).

Heatmap semantics match the host path exactly: mask logits are
bilinear-resized (torch half-pixel convention, data/preprocess.py
resize_bilinear_torch) onto the patch's canvas window of a statically
padded grid, clamped at 0, min-max normalized; sub-patch scores are
heatmap-mass fractions accumulated over the ancestor chain weighted
1/4^level (visual_search.py:451-465).

Ancestor accumulation is a running CHAIN FIELD, not a chain walk: each
expanded step i stores `chain_acc[i] = chain_acc[parent(i)] +
norm_heat_i / (total_i * 4^level_i)` in canvas coordinates, so child
scores are ONE rect-sum over `chain_acc` — identical by linearity to the
reference's per-ancestor loop. (The first implementation reconstructed
each ancestor's heat inside a nested `lax.while_loop`; measured on the
v5e that cost ~110 ms/step — dynamic-trip-count loops with large bodies
serialize badly — while the chain field costs one [Hc, Wc] add. The
resize itself is one-hot-weight MATMULS, not gathers: TPU gathers
serialize, W_y @ low @ W_x^T rides the MXU.)
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LOG = logging.getLogger(__name__)


def _log_cap(P_cur: int, P_new) -> None:
    """One-line visibility whenever the P path capacity binds (VERDICT r3
    weak #4: the cap must never end a search silently)."""
    if P_new is None:
        _LOG.warning(
            "compiled search hit the grow-limit path capacity (%d); "
            "ending in the low-confidence fallback unlike the host "
            "policy", P_cur)
    else:
        _LOG.info("compiled search outgrew path capacity %d; growing the "
                  "device state to %d", P_cur, P_new)


# Exit codes of a policy transition.
RUNNING = 0
ACCEPT = 1          # top detection sigmoid > confidence_high
NEED_CTX = 2        # heatmap weak -> host must run vqa + segment cue
QUEUE_EMPTY = 3
MAX_STEPS = 4       # path hit max_steps (or the P capacity)

# numpy (not jnp) scalars: a module-level jnp constant initializes the
# JAX backend at IMPORT time — observed r3 blocking `import
# vstar_tpu.search.compiled` for 26 minutes while the axon relay was
# down, before any caller could choose a backend. numpy scalars trace
# identically inside jit.
_NEG = np.float32(-3.4e38)
_BIGI = np.int32(2 ** 31 - 1)


class PolicyState(NamedTuple):
    # priority queue, capacity K = 4 * P (each processed step pushes <= 4)
    q_bbox: jnp.ndarray      # [K, 4] i32 (x, y, w, h) canvas pixels
    q_level: jnp.ndarray     # [K] i32 scale level
    q_score: jnp.ndarray     # [K] f32 priority
    q_parent: jnp.ndarray    # [K] i32 path index of parent
    q_counter: jnp.ndarray   # [K] i32 insertion order (heapq tie-break)
    q_valid: jnp.ndarray     # [K] bool
    counter: jnp.ndarray     # scalar i32, next free slot / insertion id
    # search path (visited steps, in visit order), capacity P
    n_path: jnp.ndarray      # scalar i32
    p_bbox: jnp.ndarray      # [P, 4] i32
    p_level: jnp.ndarray     # [P] i32
    p_parent: jnp.ndarray    # [P] i32
    p_score: jnp.ndarray     # [P] f32 (priority the step was queued with)
    p_top_logit: jnp.ndarray  # [P] f32 stashed low-confidence top sigmoid
    p_has_stash: jnp.ndarray  # [P] bool temp_detection_result present
    p_det_box: jnp.ndarray   # [P, 4] f32 patch-local [x, y, w, h] top box
    # NOTE: which steps used the context cue is host knowledge (the host
    # runs that text step and records it in ctx_cues) — no device field.


def policy_state_init(root_w: int, root_h: int, P: int) -> PolicyState:
    """Root patch [0, 0, W, H] at scale level 1, path pre-seeded with it
    (visual_search.py:487-494)."""
    K = 4 * P
    return PolicyState(
        q_bbox=jnp.zeros((K, 4), jnp.int32),
        q_level=jnp.zeros((K,), jnp.int32),
        q_score=jnp.zeros((K,), jnp.float32),
        q_parent=jnp.zeros((K,), jnp.int32),
        q_counter=jnp.zeros((K,), jnp.int32),
        q_valid=jnp.zeros((K,), bool),
        counter=jnp.int32(0),
        n_path=jnp.int32(1),
        p_bbox=jnp.zeros((P, 4), jnp.int32).at[0].set(
            jnp.asarray([0, 0, root_w, root_h], jnp.int32)),
        p_level=jnp.zeros((P,), jnp.int32).at[0].set(1),
        p_parent=jnp.full((P,), -1, jnp.int32),
        p_score=jnp.zeros((P,), jnp.float32),
        p_top_logit=jnp.zeros((P,), jnp.float32),
        p_has_stash=jnp.zeros((P,), bool),
        p_det_box=jnp.zeros((P, 4), jnp.float32),
    )


def chain_store_init(P: int, Hc: int, Wc: int) -> jnp.ndarray:
    """Per-path-step accumulated score field (canvas coords):
    chain_acc[i] = sum over (i + ancestors of i) of each step's
    normalized heat / (total * 4^level). [P, Hc, Wc] f32."""
    return jnp.zeros((P, Hc, Wc), jnp.float32)


# ---------------------------------------------------------------------------
# Heatmap math (exact host-path semantics on a statically padded grid)
# ---------------------------------------------------------------------------

def resize_clip_canvas(low: jnp.ndarray, bbox, Hc: int, Wc: int
                       ) -> jnp.ndarray:
    """clip(resize_bilinear_torch(low, h, w), 0) placed at the patch's
    canvas window [y0:y0+h, x0:x0+w] of a static [Hc, Wc] grid; zero
    elsewhere. bbox traced, so one program serves every patch of a canvas
    bucket.

    Separable bilinear as one-hot interpolation-weight MATMULS
    (W_y @ low @ W_x^T) rather than gathers — TPU gathers serialize,
    two [out, in] matmuls ride the MXU."""
    in_h, in_w = low.shape
    low = low.astype(jnp.float32)
    x0, y0 = bbox[0], bbox[1]
    w, h = bbox[2], bbox[3]

    def weights(out_static: int, off, out_dyn, in_n: int):
        c = ((jnp.arange(out_static, dtype=jnp.float32)
              - off.astype(jnp.float32) + 0.5)
             * (in_n / out_dyn.astype(jnp.float32)) - 0.5)
        c0 = jnp.floor(c)
        frac = c - c0
        c0c = jnp.clip(c0, 0, in_n - 1)
        c1c = jnp.clip(c0 + 1, 0, in_n - 1)
        j = jnp.arange(in_n, dtype=jnp.float32)[None, :]
        return ((j == c0c[:, None]) * (1 - frac)[:, None]
                + (j == c1c[:, None]) * frac[:, None])

    wy = weights(Hc, y0, h, in_h)                # [Hc, in_h]
    wx = weights(Wc, x0, w, in_w)                # [Wc, in_w]
    hi = jax.lax.Precision.HIGHEST               # true-f32 interp weights
    out = jnp.dot(jnp.dot(wy, low, precision=hi), wx.T, precision=hi)
    return jnp.where(_bbox_mask(bbox, Hc, Wc), jnp.maximum(out, 0.0), 0.0)


def _bbox_mask(bbox, Hc: int, Wc: int) -> jnp.ndarray:
    ys = jnp.arange(Hc)[:, None]
    xs = jnp.arange(Wc)[None, :]
    return ((ys >= bbox[1]) & (ys < bbox[1] + bbox[3])
            & (xs >= bbox[0]) & (xs < bbox[0] + bbox[2]))


def _minmax_bbox(heat: jnp.ndarray, bbox):
    valid = _bbox_mask(bbox, *heat.shape)
    mx = jnp.max(jnp.where(valid, heat, _NEG))
    mn = jnp.min(jnp.where(valid, heat, -_NEG))
    return mn, mx, valid


def normalize_heat(heat: jnp.ndarray, mn, mx, valid) -> jnp.ndarray:
    """normalize_score (policy.py:125-129): (h - mn)/(mx - mn), or zeros
    when the heatmap is constant."""
    rng = mx - mn
    return jnp.where(valid & (rng != 0), (heat - mn) / rng, 0.0)


def rect_sums(heat: jnp.ndarray, rects: jnp.ndarray) -> jnp.ndarray:
    """Sums of `heat` over 4 integer rects [x, y, w, h] (einsum of
    row/col indicators — no dynamic shapes, no gathers)."""
    Hc, Wc = heat.shape
    ys = jnp.arange(Hc)[None, :]
    xs = jnp.arange(Wc)[None, :]
    iy = ((ys >= rects[:, 1:2]) & (ys < rects[:, 1:2] + rects[:, 3:4])
          ).astype(jnp.float32)
    ix = ((xs >= rects[:, 0:1]) & (xs < rects[:, 0:1] + rects[:, 2:3])
          ).astype(jnp.float32)
    return jnp.einsum("cy,yx,cx->c", iy, heat, ix)


# ---------------------------------------------------------------------------
# Geometry (split_4subpatches + get_sub_patches, policy.py:91-110)
# ---------------------------------------------------------------------------

def child_rects(bbox: jnp.ndarray) -> jnp.ndarray:
    """[4] i32 (x, y, w, h) -> [4, 4] i32 children: 2x2, or 4x1/1x4 when
    the aspect ratio >= 2 or <= 0.5, remainder absorbed by the last
    patch in each direction."""
    x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    ratio = h.astype(jnp.float32) / w.astype(jnp.float32)
    num_w = jnp.where(ratio >= 2.0, 1, jnp.where(ratio <= 0.5, 4, 2))
    num_h = jnp.where(ratio >= 2.0, 4, jnp.where(ratio <= 0.5, 1, 2))
    ws = w // num_w
    hs = h // num_h
    c = jnp.arange(4, dtype=jnp.int32)
    i = c % num_w
    j = c // num_w
    cw = jnp.where(i == num_w - 1, w - i * ws, ws)
    ch = jnp.where(j == num_h - 1, h - j * hs, hs)
    return jnp.stack([x0 + i * ws, y0 + j * hs, cw, ch], axis=1)


# ---------------------------------------------------------------------------
# Policy transition pieces
# ---------------------------------------------------------------------------

def _push_children(state: PolicyState, idx, subs: jnp.ndarray,
                   scores: jnp.ndarray, do_push) -> PolicyState:
    """Queue 4 children at slots [counter, counter+4) (gated by do_push —
    slots stay invalid and the counter does not advance otherwise)."""
    K = state.q_valid.shape[0]
    slots = jnp.clip(state.counter + jnp.arange(4, dtype=jnp.int32),
                     0, K - 1)
    in_cap = (state.counter + jnp.arange(4, dtype=jnp.int32)) < K
    ok = jnp.logical_and(do_push, in_cap)
    return state._replace(
        q_bbox=state.q_bbox.at[slots].set(
            jnp.where(ok[:, None], subs, state.q_bbox[slots])),
        q_level=state.q_level.at[slots].set(
            jnp.where(ok, state.p_level[idx] + 1, state.q_level[slots])),
        q_score=state.q_score.at[slots].set(
            jnp.where(ok, scores, state.q_score[slots])),
        q_parent=state.q_parent.at[slots].set(
            jnp.where(ok, idx, state.q_parent[slots])),
        q_counter=state.q_counter.at[slots].set(
            jnp.where(ok, state.counter + jnp.arange(4, dtype=jnp.int32),
                      state.q_counter[slots])),
        q_valid=state.q_valid.at[slots].set(
            jnp.where(ok, True, state.q_valid[slots])),
        counter=state.counter + jnp.where(do_push, 4, 0).astype(jnp.int32),
    )


def _pop_append(state: PolicyState, max_steps: int) -> Tuple[PolicyState,
                                                             jnp.ndarray]:
    """heapq pop ((-score, counter) lexicographic min = max score, ties to
    the earliest insertion) + append to the path. Returns (state',
    exit_code): QUEUE_EMPTY / MAX_STEPS when the search cannot continue
    (checked in the host policy's order, policy.py:260-262)."""
    P = state.p_bbox.shape[0]
    any_valid = jnp.any(state.q_valid)
    cap = min(max_steps, P) if max_steps is not None else P
    full = state.n_path >= cap
    exit_code = jnp.where(~any_valid, QUEUE_EMPTY,
                          jnp.where(full, MAX_STEPS, RUNNING))

    best = jnp.max(jnp.where(state.q_valid, state.q_score, _NEG))
    tie = state.q_valid & (state.q_score == best)
    slot = jnp.argmin(jnp.where(tie, state.q_counter, _BIGI))
    do = exit_code == RUNNING
    n = jnp.clip(state.n_path, 0, P - 1)
    new = state._replace(
        q_valid=state.q_valid.at[slot].set(
            jnp.where(do, False, state.q_valid[slot])),
        p_bbox=state.p_bbox.at[n].set(
            jnp.where(do, state.q_bbox[slot], state.p_bbox[n])),
        p_level=state.p_level.at[n].set(
            jnp.where(do, state.q_level[slot], state.p_level[n])),
        p_parent=state.p_parent.at[n].set(
            jnp.where(do, state.q_parent[slot], state.p_parent[n])),
        p_score=state.p_score.at[n].set(
            jnp.where(do, state.q_score[slot], state.p_score[n])),
        n_path=state.n_path + jnp.where(do, 1, 0).astype(jnp.int32),
    )
    return new, exit_code


def _detect_phase(state: PolicyState, det_valid, det_logits, det_boxes,
                  confidence_high: float, apply_sigmoid: bool = False):
    """Accept test + low-confidence stash for the path tail
    (visual_search.py:398-414). apply_sigmoid: det_logits are raw head
    outputs (production); the VSMClient protocol already delivers sigmoid
    probabilities. Returns (state', accept, top_sig, accept_box)."""
    idx = state.n_path - 1
    bbox = state.p_bbox[idx]
    w = bbox[2].astype(jnp.float32)
    h = bbox[3].astype(jnp.float32)
    sig = det_logits.astype(jnp.float32)
    if apply_sigmoid:
        sig = jax.nn.sigmoid(sig)
    top = jnp.argmax(sig)
    top_sig = jnp.where(det_valid, sig[top], 0.0)
    scale = jnp.stack([w, h, w, h])
    fb = det_boxes[top].astype(jnp.float32) * scale
    fb = fb.at[0].add(-fb[2] / 2).at[1].add(-fb[3] / 2)
    accept = jnp.logical_and(det_valid, top_sig > confidence_high)
    stash = jnp.logical_and(det_valid, ~accept)
    state = state._replace(
        p_top_logit=state.p_top_logit.at[idx].set(
            jnp.where(stash, top_sig, state.p_top_logit[idx])),
        p_has_stash=state.p_has_stash.at[idx].set(
            jnp.where(stash, True, state.p_has_stash[idx])),
        p_det_box=state.p_det_box.at[idx].set(
            jnp.where(det_valid, fb, state.p_det_box[idx])),
    )
    return state, accept, top_sig, fb


def _expand_phase(state: PolicyState, chain_store: jnp.ndarray,
                  heat: jnp.ndarray, *, max_steps,
                  smallest_size, target_cue_threshold,
                  target_cue_threshold_decay,
                  target_cue_threshold_minimum,
                  skip_threshold: bool = False):
    """Threshold test + chain-field update + children push + pop for the
    path tail. heat: clipped heatmap in CANVAS coordinates (zero outside
    the tail's bbox window). skip_threshold (Python bool or traced): the
    context-cue path (the host already decided; the ctx heat is final
    regardless of its max).

    Returns (state', chain_store', exit_code)."""
    P, Hc, Wc = chain_store.shape
    idx = state.n_path - 1
    bbox = state.p_bbox[idx]
    level = state.p_level[idx]
    hp, wp = bbox[3], bbox[2]

    small = jnp.minimum(wp, hp) <= smallest_size
    mn, mx, valid = _minmax_bbox(heat, bbox)
    threshold = jnp.maximum(
        jnp.asarray(target_cue_threshold_minimum, jnp.float32),
        target_cue_threshold
        * target_cue_threshold_decay ** (level.astype(jnp.float32) - 1.0))
    weak = mx <= threshold
    skip = jnp.asarray(skip_threshold)
    need_ctx = jnp.logical_and(~skip, jnp.logical_and(~small, weak))
    expand = jnp.logical_and(~small, jnp.logical_or(skip, ~weak))

    # chain field: parent's accumulated term stack + this step's term
    heat_n = normalize_heat(heat, mn, mx, valid)
    total = jnp.sum(heat_n)
    term = jnp.where(total > 0, heat_n / total, 0.0) \
        / (4.0 ** level.astype(jnp.float32))
    parent = state.p_parent[idx]
    parent_acc = jnp.where(parent >= 0,
                           chain_store[jnp.clip(parent, 0, P - 1)], 0.0)
    acc = parent_acc + term
    new_store = chain_store.at[idx].set(
        jnp.where(expand, acc, chain_store[idx]))

    subs = child_rects(bbox)
    scores = rect_sums(acc, subs)   # == the reference's ancestor loop,
    #                                 by linearity of rect sums

    rec = _push_children(state, idx, subs, scores, expand)
    popped, exit_code = _pop_append(rec, max_steps)
    exit_code = jnp.where(need_ctx, NEED_CTX, exit_code)
    # the NEED_CTX exit must not pop (the host pushes the ctx children
    # first), so keep the pre-pop state on that branch
    state_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(need_ctx, a, b), rec, popped)
    store_out = jnp.where(need_ctx, chain_store, new_store)
    return state_out, store_out, exit_code


# ---------------------------------------------------------------------------
# Injected mode (one dispatch per step; any VSMClient or scripted oracle)
# ---------------------------------------------------------------------------

def injected_step(state: PolicyState, chain_store: jnp.ndarray,
                  det_valid, det_logits, det_boxes, heat: jnp.ndarray, *,
                  smallest_size: int, confidence_high: float,
                  target_cue_threshold: float,
                  target_cue_threshold_decay: float,
                  target_cue_threshold_minimum: float,
                  max_steps):
    """One full policy transition for the path tail given its VSM detect
    outputs. heat: the patch's clipped heatmap placed at its canvas
    window of [Hc, Wc]. Returns (state', store', exit_code, next_bbox)."""
    state, accept, _, _ = _detect_phase(state, det_valid, det_logits,
                                        det_boxes, confidence_high)
    st2, store2, exit_code = _expand_phase(
        state, chain_store, heat,
        max_steps=max_steps, smallest_size=smallest_size,
        target_cue_threshold=target_cue_threshold,
        target_cue_threshold_decay=target_cue_threshold_decay,
        target_cue_threshold_minimum=target_cue_threshold_minimum)
    # accept preempts expansion entirely
    state_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), state, st2)
    store_out = jnp.where(accept, chain_store, store2)
    exit_code = jnp.where(accept, ACCEPT, exit_code)
    nb = state_out.p_bbox[state_out.n_path - 1]
    return state_out, store_out, exit_code, nb


def grow_and_pop(state: PolicyState, chain_store: jnp.ndarray, *,
                 P2: int, max_steps):
    """Double the path/queue capacity ON DEVICE and pop the next step.

    Called when a search hits the P capacity (exit MAX_STEPS) while the
    caller's max_steps is NOT the binding cap: the reference recursion is
    bounded only by patch size (visual_search.py:416-418), so the
    compiled search must not silently end in the low-confidence fallback
    at an implementation limit. The tail step was already fully processed
    (children pushed) before the capped exit, so growth pops the next
    queued patch rather than re-entering the loop on a stale tail (which
    would push its children twice).

    Queue entries can never have been dropped before growth: each of the
    <= P processed steps pushes <= 4 children, so counter <= 4P = K.
    Returns (state', store', exit_code, next_bbox); each (P, P2) pair
    compiles its own (small, policy-only) program."""
    P = state.p_bbox.shape[0]
    assert P2 > P, (P, P2)
    K, K2 = 4 * P, 4 * P2

    def padq(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((K2 - K,) + a.shape[1:], fill, a.dtype)])

    def padp(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((P2 - P,) + a.shape[1:], fill, a.dtype)])

    st = PolicyState(
        q_bbox=padq(state.q_bbox), q_level=padq(state.q_level),
        q_score=padq(state.q_score), q_parent=padq(state.q_parent),
        q_counter=padq(state.q_counter), q_valid=padq(state.q_valid),
        counter=state.counter, n_path=state.n_path,
        p_bbox=padp(state.p_bbox), p_level=padp(state.p_level),
        p_parent=padp(state.p_parent, -1), p_score=padp(state.p_score),
        p_top_logit=padp(state.p_top_logit),
        p_has_stash=padp(state.p_has_stash),
        p_det_box=padp(state.p_det_box))
    store2 = jnp.concatenate(
        [chain_store,
         jnp.zeros((P2 - P,) + chain_store.shape[1:], chain_store.dtype)])
    st, code = _pop_append(st, max_steps)
    nb = st.p_bbox[st.n_path - 1]
    return st, store2, code, nb


def context_push(state: PolicyState, chain_store: jnp.ndarray,
                 heat: jnp.ndarray, *, smallest_size: int,
                 target_cue_threshold: float,
                 target_cue_threshold_decay: float,
                 target_cue_threshold_minimum: float, max_steps):
    """Host-computed context-cue heat (canvas coords) for the path tail
    -> chain-field update + push children + pop (the step's detect phase
    already ran). Returns (state', store', exit_code, next_bbox)."""
    st, store, exit_code = _expand_phase(
        state, chain_store, heat,
        max_steps=max_steps, smallest_size=smallest_size,
        target_cue_threshold=target_cue_threshold,
        target_cue_threshold_decay=target_cue_threshold_decay,
        target_cue_threshold_minimum=target_cue_threshold_minimum,
        skip_threshold=True)
    nb = st.p_bbox[st.n_path - 1]
    return st, store, exit_code, nb


# ---------------------------------------------------------------------------
# Production fused mode: the whole detect-path search as ONE program
# ---------------------------------------------------------------------------

# Rows of the stacked prompt layouts the fused programs multiplex between
# per iteration (ONE vsm_generate serves all three — no branch-duplicated
# compiles, no separate context-cue programs).
DETECT_ROW, CTXQ_ROW, CTXSEG_ROW = 0, 1, 2


def _pack_exit(code, state: PolicyState, ans_tok, ans_n) -> jnp.ndarray:
    """i32 [7 + max_new]: [code, n_path, ans_n, tail bbox(4), answer
    tokens] — everything the host needs after a fused call in ONE
    device->host fetch (each extra fetch is a 5-15 ms relay round trip)."""
    idx = jnp.maximum(state.n_path - 1, 0)
    return jnp.concatenate([
        jnp.stack([code, state.n_path, ans_n]).astype(jnp.int32),
        state.p_bbox[idx].astype(jnp.int32),
        ans_tok.astype(jnp.int32)])


def fused_search(params, cfg, canvas: jnp.ndarray, state: PolicyState,
                 chain_store: jnp.ndarray,
                 text_ids, feat_idx, is_feat, lens, draft_ids,
                 push_pending,
                 smallest_size, confidence_high, target_cue_threshold,
                 target_cue_threshold_decay, target_cue_threshold_minimum,
                 *, loc_token_id: int, max_new_tokens: int, eos_id: int,
                 cache_len: int, compute_dtype, spec_chunk: int,
                 max_steps, kv_int8: bool = False):
    """Run detect-path search steps until an exit condition, entirely on
    device: per iteration {pop tail -> extract both tower windows from the
    canvas -> full VSM (towers + prefill + speculative decode + [LOC]
    heads) -> accept test / stash / split / chain-field push / pop}.

    text_ids/feat_idx/is_feat: [3, 1, S] stacked layouts, lens [3, 1]
    (rows: DETECT, CTXQ = the fixed common-sense context question, CTXSEG
    = the host-updated segment prompt). The context cue runs IN-PROGRAM:
    when a step's heat is weak the NEXT iteration decodes the context
    ANSWER with the CTXQ row on the same tail windows and exits with the
    tokens in the packed record (the noun-chunk parse is the only
    inherently-host step); the host re-enters ONCE with the CTXSEG row +
    push_pending=True, and that iteration runs the segment generate, the
    skip-threshold push, and keeps searching — one dispatch + one fetch
    per context event, all in this single program (r3 served each event
    with 3+ separate engine waves).

    canvas: CLIP-normalized f32 [Hb, Wb, 3]; thresholds and smallest_size
    are traced, so one program serves every search of a canvas bucket.
    Returns (state', store', exit_rec (_pack_exit), det_logits,
    det_boxes) with the det arrays from the LAST detect step (root
    multi-instance accept reads them host-side)."""
    from ..kernels.image_ops import window_resize
    from ..models.vsm import vsm_generate

    Hc, Wc, _ = canvas.shape
    clip_size = cfg.vision.image_size
    owl_size = cfg.owl_vision.image_size
    n_det = (owl_size // cfg.owl_vision.patch_size) ** 2

    def body(carry):
        (state, store, code, det_l, det_b, ans_tok, ans_n, answered,
         pending) = carry
        ctx_ans = code == NEED_CTX          # decode the context answer
        push = jnp.logical_and(~ctx_ans, pending)   # segment + push
        detect = jnp.logical_and(~ctx_ans, ~push)   # normal search step

        idx = state.n_path - 1
        bbox = state.p_bbox[idx]
        x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
        side = jnp.maximum(w, h)
        sq = jnp.stack([x0 - (side - w) // 2, y0 - (side - h) // 2,
                        side, side]).astype(jnp.float32)
        cr = bbox.astype(jnp.float32)
        clip_img = window_resize(canvas, sq, clip_size, mask_bbox=cr)[None]
        owl_img = window_resize(canvas, cr, owl_size, mask_bbox=cr)[None]

        row = jnp.where(ctx_ans, CTXQ_ROW,
                        jnp.where(push, CTXSEG_ROW, DETECT_ROW))
        out = vsm_generate(params, cfg, clip_img, owl_img, text_ids[row],
                           feat_idx[row], is_feat[row], lens[row],
                           loc_token_id=loc_token_id,
                           max_new_tokens=max_new_tokens, eos_id=eos_id,
                           cache_len=cache_len,
                           compute_dtype=compute_dtype,
                           draft_ids=draft_ids, spec_chunk=spec_chunk,
                           kv_int8=kv_int8)
        det_valid = out.loc_valid[0]
        st2, accept, _, _ = _detect_phase(
            state, det_valid, out.det_logits[0], out.det_boxes[0],
            confidence_high, apply_sigmoid=True)
        accept = jnp.logical_and(accept, detect)
        # the segment call's det outputs must not stash (host semantics:
        # the step's detect phase already ran before the ctx event)
        st2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(detect, a, b), st2, state)
        heat = jnp.where(det_valid,
                         resize_clip_canvas(out.mask_logits[0], bbox,
                                            Hc, Wc), 0.0)
        st3, store3, code2 = _expand_phase(
            st2, store, heat,
            max_steps=max_steps, smallest_size=smallest_size,
            target_cue_threshold=target_cue_threshold,
            target_cue_threshold_decay=target_cue_threshold_decay,
            target_cue_threshold_minimum=target_cue_threshold_minimum,
            skip_threshold=push)
        sel_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), st2, st3)
        state_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ctx_ans, a, b), state, sel_state)
        store_out = jnp.where(jnp.logical_or(ctx_ans, accept), store,
                              store3)
        code_out = jnp.where(ctx_ans, code,
                             jnp.where(accept, ACCEPT,
                                       code2)).astype(jnp.int32)
        det_l = jnp.where(detect, out.det_logits[0].astype(jnp.float32),
                          det_l)
        det_b = jnp.where(detect, out.det_boxes[0].astype(jnp.float32),
                          det_b)
        ans_tok = jnp.where(ctx_ans, out.tokens[0].astype(jnp.int32),
                            ans_tok)
        ans_n = jnp.where(ctx_ans,
                          out.num_generated[0].astype(jnp.int32), ans_n)
        answered = jnp.logical_or(answered, ctx_ans)
        pending = jnp.logical_and(pending, ~push)
        return (state_out, store_out, code_out, det_l, det_b, ans_tok,
                ans_n, answered, pending)

    def cond(c):
        code, answered = c[2], c[7]
        return jnp.logical_or(
            code == RUNNING,
            jnp.logical_and(code == NEED_CTX, ~answered))

    carry = (state, chain_store, jnp.int32(RUNNING),
             jnp.zeros((n_det,), jnp.float32),
             jnp.zeros((n_det, 4), jnp.float32),
             jnp.zeros((max_new_tokens,), jnp.int32),
             jnp.int32(0), jnp.asarray(False),
             jnp.asarray(push_pending))
    (state, store, code, det_l, det_b, ans_tok, ans_n, _, _
     ) = jax.lax.while_loop(cond, body, carry)
    return state, store, _pack_exit(code, state, ans_tok, ans_n), \
        det_l, det_b


def context_push_low(state: PolicyState, chain_store: jnp.ndarray,
                     ctx_low: jnp.ndarray, ctx_valid,
                     smallest_size, target_cue_threshold,
                     target_cue_threshold_decay,
                     target_cue_threshold_minimum, *, max_steps):
    """Production context-cue push: the host-served segment call's raw
    low-res mask logits become the tail's final heatmap. Returns
    (state', store', exit_code)."""
    Hc, Wc = chain_store.shape[1:]
    idx = state.n_path - 1
    bbox = state.p_bbox[idx]
    heat = jnp.where(ctx_valid,
                     resize_clip_canvas(ctx_low, bbox, Hc, Wc), 0.0)
    st, store, code = _expand_phase(
        state, chain_store, heat,
        max_steps=max_steps, smallest_size=smallest_size,
        target_cue_threshold=target_cue_threshold,
        target_cue_threshold_decay=target_cue_threshold_decay,
        target_cue_threshold_minimum=target_cue_threshold_minimum,
        skip_threshold=True)
    return st, store, code


# ---------------------------------------------------------------------------
# Batched fused mode: B concurrent searches in ONE program
# ---------------------------------------------------------------------------

def fused_search_batched(params, cfg, canvases: jnp.ndarray, states,
                         stores: jnp.ndarray, codes: jnp.ndarray,
                         text_ids, feat_idx, is_feat, lens, draft_ids,
                         push_pending,
                         smallest_sizes, confidence_high,
                         target_cue_threshold, target_cue_threshold_decay,
                         target_cue_threshold_minimum,
                         *, loc_token_id: int, max_new_tokens: int,
                         eos_id: int, cache_len: int, compute_dtype,
                         spec_chunk: int, max_steps,
                         kv_int8: bool = False):
    """B concurrent searches advance in lockstep inside one while_loop:
    every iteration extracts each ENGAGED search's tower windows from its
    canvas, runs ONE batched VSM generate (the 7B weight reads shared
    across searches), and applies the vmapped policy transition. Searches
    are independent, so results are identical to B separate
    `fused_search` runs.

    Context cues run in-program like the single form: a row whose step
    goes weak decodes the context ANSWER on the next iteration (CTXQ row
    of its stacked layouts) alongside the other rows' detect steps, then
    rides along answered; the host parses the phrases for all such rows
    at once and re-enters with their CTXSEG rows + push_pending mask —
    the push iteration and all further detect steps share the same
    dispatch with the still-running rows.

    canvases [B, Hc, Wc, 3]; states: PolicyState stacked on a leading B;
    stores [B, P, Hc, Wc]; codes [B] i32 (RUNNING entries advance);
    text_ids/feat_idx/is_feat [3, B, S], lens [3, B]; push_pending [B]
    bool; smallest_sizes [B]. Returns (states, stores, exit_recs
    [B, 7 + max_new] (_pack_exit), det_logits [B, N], det_boxes
    [B, N, 4]) with det arrays from each row's LAST detect step."""
    from ..kernels.image_ops import window_resize
    from ..models.vsm import vsm_generate

    B, Hc, Wc, _ = canvases.shape
    clip_size = cfg.vision.image_size
    owl_size = cfg.owl_vision.image_size
    n_det = (owl_size // cfg.owl_vision.patch_size) ** 2

    def extract_one(canvas, bbox):
        x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
        side = jnp.maximum(w, h)
        sq = jnp.stack([x0 - (side - w) // 2, y0 - (side - h) // 2,
                        side, side]).astype(jnp.float32)
        cr = bbox.astype(jnp.float32)
        return (window_resize(canvas, sq, clip_size, mask_bbox=cr),
                window_resize(canvas, cr, owl_size, mask_bbox=cr))

    def policy_one(state, store, mode_ctx, mode_push, det_valid,
                   det_logits, det_boxes, heat, smallest):
        mode_detect = jnp.logical_and(~mode_ctx, ~mode_push)
        st2, accept, _, _ = _detect_phase(
            state, det_valid, det_logits, det_boxes, confidence_high,
            apply_sigmoid=True)
        accept = jnp.logical_and(accept, mode_detect)
        st2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(mode_detect, a, b), st2, state)
        st3, store3, code = _expand_phase(
            st2, store, heat,
            max_steps=max_steps, smallest_size=smallest,
            target_cue_threshold=target_cue_threshold,
            target_cue_threshold_decay=target_cue_threshold_decay,
            target_cue_threshold_minimum=target_cue_threshold_minimum,
            skip_threshold=mode_push)
        sel = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), st2, st3)
        state_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(mode_ctx, a, b), state, sel)
        store_out = jnp.where(jnp.logical_or(mode_ctx, accept), store,
                              store3)
        code = jnp.where(mode_ctx, NEED_CTX,
                         jnp.where(accept, ACCEPT, code)).astype(jnp.int32)
        return state_out, store_out, code

    def _mask_tree(active, new, old):
        def w(a, b):
            m = active.reshape((B,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)
        return jax.tree_util.tree_map(w, new, old)

    def body(carry):
        (states, stores, codes, det_l, det_b, ans_tok, ans_n, answered,
         pending) = carry
        ctx_ans = jnp.logical_and(codes == NEED_CTX, ~answered)   # [B]
        running = codes == RUNNING
        push = jnp.logical_and(running, pending)
        detect = jnp.logical_and(running, ~pending)
        engaged = jnp.logical_or(ctx_ans, running)

        idx = states.n_path - 1                      # [B]
        bboxes = jnp.take_along_axis(
            states.p_bbox, idx[:, None, None], axis=1)[:, 0]   # [B, 4]
        clip_imgs, owl_imgs = jax.vmap(extract_one)(canvases, bboxes)
        row = jnp.where(ctx_ans, CTXQ_ROW,
                        jnp.where(push, CTXSEG_ROW, DETECT_ROW))   # [B]
        rsel = (row, jnp.arange(B))
        out = vsm_generate(params, cfg, clip_imgs, owl_imgs,
                           text_ids[rsel], feat_idx[rsel], is_feat[rsel],
                           lens[rsel],
                           loc_token_id=loc_token_id,
                           max_new_tokens=max_new_tokens, eos_id=eos_id,
                           cache_len=cache_len,
                           compute_dtype=compute_dtype,
                           draft_ids=draft_ids, spec_chunk=spec_chunk,
                           kv_int8=kv_int8)
        heat = jax.vmap(
            lambda low, bbox, dv: jnp.where(
                dv, resize_clip_canvas(low, bbox, Hc, Wc), 0.0)
        )(out.mask_logits, bboxes, out.loc_valid)
        n_states, n_stores, n_codes = jax.vmap(policy_one)(
            states, stores, ctx_ans, push, out.loc_valid, out.det_logits,
            out.det_boxes, heat, smallest_sizes)
        states = _mask_tree(engaged, n_states, states)
        stores = jnp.where(engaged[:, None, None, None], n_stores, stores)
        codes = jnp.where(engaged, n_codes, codes)
        det_l = jnp.where(detect[:, None],
                          out.det_logits.astype(jnp.float32), det_l)
        det_b = jnp.where(detect[:, None, None],
                          out.det_boxes.astype(jnp.float32), det_b)
        ans_tok = jnp.where(ctx_ans[:, None],
                            out.tokens.astype(jnp.int32), ans_tok)
        ans_n = jnp.where(ctx_ans,
                          out.num_generated.astype(jnp.int32), ans_n)
        answered = jnp.logical_or(answered, ctx_ans)
        pending = jnp.logical_and(pending, ~push)
        return (states, stores, codes, det_l, det_b, ans_tok, ans_n,
                answered, pending)

    def cond(c):
        codes, answered = c[2], c[7]
        return jnp.any(jnp.logical_or(
            codes == RUNNING,
            jnp.logical_and(codes == NEED_CTX, ~answered)))

    carry = (states, stores, codes.astype(jnp.int32),
             jnp.zeros((B, n_det), jnp.float32),
             jnp.zeros((B, n_det, 4), jnp.float32),
             jnp.zeros((B, max_new_tokens), jnp.int32),
             jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), bool),
             push_pending)
    (states, stores, codes, det_l, det_b, ans_tok, ans_n, _, _
     ) = jax.lax.while_loop(cond, body, carry)
    exit_recs = jax.vmap(_pack_exit)(codes, states, ans_tok, ans_n)
    return states, stores, exit_recs, det_l, det_b


def context_push_low_batched(states, stores: jnp.ndarray,
                             codes: jnp.ndarray, ctx_low: jnp.ndarray,
                             ctx_valid, ctx_mask,
                             smallest_sizes, target_cue_threshold,
                             target_cue_threshold_decay,
                             target_cue_threshold_minimum, *, max_steps):
    """Batched production context-cue push: rows with ctx_mask get their
    host-served segment logits recorded + children pushed + next step
    popped (code RUNNING again unless the queue/cap ended them); other
    rows pass through untouched."""
    B = ctx_mask.shape[0]
    Hc, Wc = stores.shape[2:]

    def one_s(state, store, low, valid, smallest):
        idx = state.n_path - 1
        bbox = state.p_bbox[idx]
        heat = jnp.where(valid, resize_clip_canvas(low, bbox, Hc, Wc),
                         0.0)
        st, s2, code = _expand_phase(
            state, store, heat,
            max_steps=max_steps, smallest_size=smallest,
            target_cue_threshold=target_cue_threshold,
            target_cue_threshold_decay=target_cue_threshold_decay,
            target_cue_threshold_minimum=target_cue_threshold_minimum,
            skip_threshold=True)
        return st, s2, code

    n_states, n_stores, n_codes = jax.vmap(one_s)(
        states, stores, ctx_low, ctx_valid, smallest_sizes)

    def w(a, b):
        m = ctx_mask.reshape((B,) + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    states = jax.tree_util.tree_map(w, n_states, states)
    stores = jnp.where(ctx_mask[:, None, None, None], n_stores, stores)
    codes = jnp.where(ctx_mask, n_codes, codes).astype(jnp.int32)
    return states, stores, codes


# ---------------------------------------------------------------------------
# Host driver, injected mode: device policy x any VSMClient
# ---------------------------------------------------------------------------

def visual_search_device_policy(client, image, target_object_name: str,
                                smallest_size: int = 224,
                                confidence_high: float = 0.5,
                                confidence_low: float = 0.3,
                                target_cue_threshold: float = 6.0,
                                target_cue_threshold_decay: float = 0.7,
                                target_cue_threshold_minimum: float = 3.0,
                                max_steps: Optional[int] = None,
                                P: int = 32, grow_limit: int = 256,
                                path_out: Optional[list] = None):
    """`visual_search` with every policy decision (queue, thresholds,
    splits, ancestor scores) made by jitted device transitions; the host
    only relays VSM calls and the text-dependent context-cue phrase.
    Same return contract: (final_step, path_length, success,
    all_valid_boxes).

    P is the initial path capacity; when a search outgrows it (and
    max_steps is not the binding cap) the state doubles on device
    (grow_and_pop) up to grow_limit, so tail behavior matches the host
    policy, whose recursion is bounded only by patch size."""
    import functools

    import numpy as np

    from .policy import (PatchRef, context_phrase, context_question,
                         unwrap_patch)

    W, H = image.width, image.height
    Hc, Wc = H, W          # padded heat grid: every patch fits the root
    state = policy_state_init(W, H, P)
    store = chain_store_init(P, Hc, Wc)

    kw = dict(smallest_size=smallest_size,
              confidence_high=confidence_high,
              target_cue_threshold=target_cue_threshold,
              target_cue_threshold_decay=target_cue_threshold_decay,
              target_cue_threshold_minimum=target_cue_threshold_minimum,
              max_steps=max_steps)
    step_fn = jax.jit(functools.partial(injected_step, **kw))
    ckw = dict(kw)
    ckw.pop("confidence_high")
    ctx_fn = jax.jit(functools.partial(context_push, **ckw))
    grow_fn = jax.jit(grow_and_pop, static_argnames=("P2", "max_steps"))

    def pad_heat(h2d, bbox):
        # the client's heatmap is patch-local; the device policy wants it
        # at the patch's canvas window
        out = np.zeros((Hc, Wc), np.float32)
        a = np.asarray(h2d, np.float32)
        x0, y0 = int(bbox[0]), int(bbox[1])
        out[y0:y0 + a.shape[0], x0:x0 + a.shape[1]] = a
        return jnp.asarray(out)

    cur_bbox = [0, 0, W, H]
    ctx_cues = {}          # path idx -> "answer#phrase"
    accept_info = None     # (boxes, logits, bbox) of the accepting call
    code = RUNNING
    n_steps = 0
    P_cur = P
    while True:
        patch = PatchRef(image, cur_bbox)
        pil = unwrap_patch(patch)
        boxes, logits, heat = client.detect(pil, target_object_name)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        logits = np.asarray(logits, np.float32).reshape(-1)
        det_valid = len(logits) > 0
        if not det_valid:
            boxes = np.zeros((1, 4), np.float32)
            logits = np.zeros((1,), np.float32)
        state, store, code, nb = step_fn(
            state, store, det_valid, jnp.asarray(logits),
            jnp.asarray(boxes), pad_heat(heat, cur_bbox))
        code = int(code)
        n_steps += 1
        if code == ACCEPT:
            accept_info = (boxes, logits, list(cur_bbox))
            break
        if code == NEED_CTX:
            answer = client.vqa(pil, context_question(target_object_name))
            phrase = context_phrase(answer, target_object_name)
            ctx = client.segment(pil, phrase)
            ctx_cues[n_steps - 1] = answer + "#" + phrase
            state, store, code, nb = ctx_fn(state, store,
                                            pad_heat(ctx, cur_bbox))
            code = int(code)
        if code == MAX_STEPS and (max_steps is None
                                  or max_steps > P_cur):
            if P_cur < grow_limit:
                P_new = min(2 * P_cur, grow_limit)
                _log_cap(P_cur, P_new)
                state, store, code, nb = grow_fn(state, store, P2=P_new,
                                                 max_steps=max_steps)
                P_cur = P_new
                code = int(code)
            else:
                _log_cap(P_cur, None)
        if code != RUNNING:
            break
        cur_bbox = [int(v) for v in np.asarray(nb)]

    return _finalize(state, code, accept_info, confidence_low, ctx_cues,
                     path_out)


def pack_record(state: PolicyState) -> jnp.ndarray:
    """Flatten the host-relevant path record into ONE f32 vector so the
    driver fetches it in a single device->host transfer (each separate
    np.asarray costs a 5-15 ms relay round trip)."""
    f = jnp.float32
    return jnp.concatenate([
        state.n_path[None].astype(f),
        state.p_bbox.astype(f).reshape(-1),       # P*4
        state.p_level.astype(f),                  # P
        state.p_parent.astype(f),                 # P
        state.p_score.astype(f),                  # P
        state.p_top_logit.astype(f),              # P
        state.p_has_stash.astype(f),              # P
        state.p_det_box.reshape(-1),              # P*4
    ])


def _unpack_record(flat, P: int):
    import numpy as np
    flat = np.asarray(flat, np.float32)
    n = int(flat[0])
    o = 1
    out = {"n": n}
    for name, width, dtype in (
            ("p_bbox", 4 * P, None), ("p_level", P, np.int32),
            ("p_parent", P, np.int32), ("p_score", P, None),
            ("p_top_logit", P, None), ("p_has_stash", P, bool),
            ("p_det_box", 4 * P, None)):
        v = flat[o:o + width]
        o += width
        if width == 4 * P:
            v = v.reshape(P, 4)
        if dtype is not None:
            v = np.round(v).astype(dtype) if dtype is np.int32 \
                else v > 0.5
        out[name] = v[:n]
    return out


def _finalize(state, code: int, accept_info,
              confidence_low: float, ctx_cues: dict,
              path_out: Optional[list]):
    """Fetch the path record once and apply the host policy's ending
    (policy.py:266-284): success bookkeeping, root multi-instance boxes,
    low-confidence fallback over the stashed detections.

    state: a PolicyState (fetched per-field) or an _unpack_record dict
    (single-transfer path). accept_info may be a zero-arg callable so
    the [2304]-sized det arrays transfer only when actually needed
    (root multi-instance accept)."""
    import numpy as np

    from .policy import SearchStep

    if isinstance(state, dict):
        rec = state
    else:
        rec = _unpack_record(pack_record(state), state.p_bbox.shape[0])
    n = rec["n"]
    p_bbox = rec["p_bbox"]
    p_level = rec["p_level"]
    p_parent = rec["p_parent"]
    p_score = rec["p_score"]
    p_stash_logit = rec["p_top_logit"]
    p_has_stash = rec["p_has_stash"]
    p_det_box = rec["p_det_box"]

    steps = []
    for i in range(n):
        steps.append(SearchStep(
            bbox=[int(v) for v in p_bbox[i]],
            scale_level=int(p_level[i]),
            score=None if i == 0 else float(p_score[i]),
            parent_index=int(p_parent[i]),
            context_cue=ctx_cues.get(i)))
        if p_has_stash[i]:
            steps[i].temp_detection_result = (
                float(p_stash_logit[i]), p_det_box[i].copy())
    if path_out is not None:
        path_out[:] = steps

    success = code == ACCEPT
    all_valid_boxes = None
    if success:
        final_step = steps[-1]
        final_step.detection_result = p_det_box[n - 1].copy()
        if n == 1:
            boxes, logits, bbox = accept_info() if callable(accept_info) \
                else accept_info
            scale = np.asarray([bbox[2], bbox[3], bbox[2], bbox[3]],
                               np.float32)
            valid = boxes[logits > 0.5].reshape(-1, 4) * scale[None]
            valid[:, :2] -= valid[:, 2:] / 2
            all_valid_boxes = valid
        return final_step, n, True, all_valid_boxes

    max_logit = 0.0
    final_step = None
    path_length = 0
    for i in range(n):
        if p_has_stash[i] and float(p_stash_logit[i]) > max_logit:
            max_logit = float(p_stash_logit[i])
            final_step = steps[i]
            path_length = i + 1
    if final_step is not None:
        final_step.detection_result = final_step.temp_detection_result[1]
    return final_step, path_length, max_logit >= confidence_low, None


# ---------------------------------------------------------------------------
# Production engine: whole-search-on-device over a BatchedVSMEngine
# ---------------------------------------------------------------------------

class CompiledVSMSearch:
    """Whole detect-path searches in ONE device dispatch.

    Wraps a device-preprocessing BatchedVSMEngine: its canvas cache feeds
    `fused_search` (window extraction + VSM + policy in a device loop),
    and its batched vqa/segment waves serve the rare context-cue
    fallback. Like `--device-preprocess`, patch pixels come from the
    device canvas (jax cubic resampling), so this is the throughput/
    latency mode; the host-PIL engines remain the exact-parity default.

    P sizes the device path record and the [P, Hc, Wc] chain-field store
    (12.6 MB per step at a 2K canvas). A search that outgrows it GROWS
    the state on device (grow_and_pop: capacity doubles up to grow_limit)
    and continues — matching the host policy, whose recursion is bounded
    only by patch size (visual_search.py:416-418). Each grown P compiles
    its own fused program (rare; logged). grow_limit=None pins the old
    fallback-at-P behavior. Batched searches that hit the cap re-run
    serially through the growable path (searches are independent, so
    results are unchanged)."""

    BATCH_BUCKETS = (1, 2, 4)

    def __init__(self, engine, P: int = 16, batch_buckets=None,
                 grow_limit: Optional[int] = 256):
        assert getattr(engine, "device_preprocess", False), \
            "CompiledVSMSearch needs a device_preprocess BatchedVSMEngine"
        self.engine = engine
        self.P = P
        self.grow_limit = P if grow_limit is None else max(P, grow_limit)
        if batch_buckets is not None:
            self.BATCH_BUCKETS = tuple(sorted(batch_buckets))
        self._jit_fused = jax.jit(
            fused_search,
            static_argnames=("cfg", "loc_token_id", "max_new_tokens",
                             "eos_id", "cache_len", "compute_dtype",
                             "spec_chunk", "max_steps", "kv_int8"),
            donate_argnums=(3, 4))     # state + chain store
        self._jit_ctx = jax.jit(
            context_push_low, static_argnames=("max_steps",),
            donate_argnums=(0, 1))
        self._jit_grow = jax.jit(
            grow_and_pop, static_argnames=("P2", "max_steps"),
            donate_argnums=(0, 1))
        self._jit_pack = jax.jit(pack_record)
        self._jit_fused_b = jax.jit(
            fused_search_batched,
            static_argnames=("cfg", "loc_token_id", "max_new_tokens",
                             "eos_id", "cache_len", "compute_dtype",
                             "spec_chunk", "max_steps", "kv_int8"),
            donate_argnums=(3, 4))     # states + stores (codes are a
        #                                tiny fresh upload per call —
        #                                donating them only warns)
        self._jit_ctx_b = jax.jit(
            context_push_low_batched, static_argnames=("max_steps",),
            donate_argnums=(0, 1))
        self._jit_pack_b = jax.jit(jax.vmap(pack_record))

    def prefetch_canvas(self, image):
        """Delegate to the wrapped engine: admission-time canvas uploads
        must keep overlapping with queue wait / host work when the serving
        or eval layer wraps the engine in the compiled-search mode
        (serve/continuous.py and eval/batched_bench.py discover this via
        getattr, so without the delegation the overlap silently no-ops)."""
        self.engine.prefetch_canvas(image)

    def set_canvas_capacity(self, n: int):
        """Delegate (one shared LRU: fused searches read canvases through
        engine._canvas too)."""
        self.engine.set_canvas_capacity(n)

    def _question_ids(self, question: str):
        from ..multimodal.tokenizer import tokenize_with_image
        eng = self.engine
        return tokenize_with_image(eng._build_prompt(question),
                                   eng.tokenizer)

    def _prompt_layouts(self, name: str):
        """(detect layout, ctx-question layout, shared bucket) — both
        prompts of a search live in ONE bucket so the fused program's
        in-loop layout multiplexing keeps static shapes."""
        from ..multimodal.splicing import build_layout
        from .policy import context_question
        eng = self.engine
        det_ids = self._question_ids(
            f"Please locate the {name} in this image.")
        q_ids = self._question_ids(context_question(name))
        n_img = eng.cfg.image_tokens
        bucket = eng._bucket(max(len(det_ids), len(q_ids)) - 1 + n_img)
        mk = lambda ids: build_layout(ids, bucket, n_long=n_img,  # noqa: E731
                                      n_short=0, image_long=True)
        return mk(det_ids), mk(q_ids), bucket

    def _seg_layout(self, phrase: str, bucket: int):
        """Layout for the ctx segment prompt at the search's shared
        bucket, or None when the phrase overflows it (rare; that event
        falls back to a host-served wave)."""
        from ..multimodal.splicing import build_layout
        eng = self.engine
        ids = self._question_ids(
            f"Please locate the {phrase} in this image.")
        if len(ids) - 1 + eng.cfg.image_tokens > bucket:
            return None
        return build_layout(ids, bucket, n_long=eng.cfg.image_tokens,
                            n_short=0, image_long=True)

    def _decode_answer(self, toks) -> str:
        text = self.engine.tokenizer.decode([int(t) for t in toks],
                                            skip_special_tokens=True)
        return text.replace("\n", "").replace("  ", " ").strip()

    def search(self, image, target_object_name: str,
               smallest_size: int = 224, confidence_high: float = 0.5,
               confidence_low: float = 0.3,
               target_cue_threshold: float = 6.0,
               target_cue_threshold_decay: float = 0.7,
               target_cue_threshold_minimum: float = 3.0,
               max_steps: Optional[int] = None,
               path_out: Optional[list] = None):
        """visual_search-compatible: returns (final_step, path_length,
        success, all_valid_boxes)."""
        import numpy as np

        from .engine import _round128
        from .policy import PatchRef, context_phrase

        eng = self.engine
        canvas = eng._canvas(image)
        Hc, Wc = canvas.shape[:2]
        det_lay, q_lay, bucket = self._prompt_layouts(target_object_name)
        cache_len = bucket + _round128(eng.max_new_tokens + eng.spec_chunk)
        draft = None
        if eng._draft_row is not None:
            draft = jnp.asarray(eng._draft_row[None])

        state = policy_state_init(image.width, image.height, self.P)
        store = chain_store_init(self.P, Hc, Wc)
        # [3, 1, S] stacked layouts; the CTXSEG row starts as a detect
        # placeholder (never read until push_pending)
        text3 = np.stack([det_lay.text_ids, q_lay.text_ids,
                          det_lay.text_ids])[:, None]
        feat3 = np.stack([det_lay.feat_idx, q_lay.feat_idx,
                          det_lay.feat_idx])[:, None]
        isf3 = np.stack([det_lay.is_feat, q_lay.is_feat,
                         det_lay.is_feat])[:, None]
        lens3 = np.asarray([[det_lay.length], [q_lay.length],
                            [det_lay.length]], np.int32)

        ctx_cues = {}
        P_cur = self.P
        push = False
        while True:
            state, store, exit_rec, det_logits, det_boxes = \
                self._jit_fused(
                    eng.params, eng.cfg, canvas, state, store,
                    jnp.asarray(text3), jnp.asarray(feat3),
                    jnp.asarray(isf3), jnp.asarray(lens3), draft,
                    jnp.asarray(push), smallest_size,
                    confidence_high, target_cue_threshold,
                    target_cue_threshold_decay,
                    target_cue_threshold_minimum,
                    loc_token_id=eng.loc_token_id,
                    max_new_tokens=eng.max_new_tokens, eos_id=eng.eos_id,
                    cache_len=cache_len, compute_dtype=eng.compute_dtype,
                    spec_chunk=eng.spec_chunk, max_steps=max_steps,
                    kv_int8=getattr(eng, "kv_int8", False))
            rec = np.asarray(exit_rec)        # ONE fetch per fused call
            code = int(rec[0])
            push = False
            if code == NEED_CTX:
                # the context ANSWER was decoded in-program; only the
                # noun-chunk parse runs here, then ONE re-dispatch does
                # segment + push + the rest of the search
                idx = int(rec[1]) - 1
                answer = self._decode_answer(rec[7:7 + int(rec[2])])
                phrase = context_phrase(answer, target_object_name)
                ctx_cues[idx] = answer + "#" + phrase
                seg_lay = self._seg_layout(phrase, bucket)
                if seg_lay is not None:
                    text3[CTXSEG_ROW, 0] = seg_lay.text_ids
                    feat3[CTXSEG_ROW, 0] = seg_lay.feat_idx
                    isf3[CTXSEG_ROW, 0] = seg_lay.is_feat
                    lens3[CTXSEG_ROW, 0] = seg_lay.length
                    push = True
                    continue
                # phrase overflowed the search's bucket: serve this event
                # as a host wave (rare; keeps any phrase length working)
                bbox = [int(v) for v in rec[3:7]]
                patch = PatchRef(image, bbox)
                p = patch if eng.wants_patch_refs else patch.pil()
                out, _ = eng._run_many(
                    [p], [f"Please locate the {phrase} in this image."])
                state, store, code = self._jit_ctx(
                    state, store, out.mask_logits[0], out.loc_valid[0],
                    smallest_size, target_cue_threshold,
                    target_cue_threshold_decay,
                    target_cue_threshold_minimum, max_steps=max_steps)
                code = int(code)
                if code == RUNNING:
                    continue
            if code == MAX_STEPS and (max_steps is None
                                      or max_steps > P_cur):
                if P_cur < self.grow_limit:
                    P_new = min(2 * P_cur, self.grow_limit)
                    _log_cap(P_cur, P_new)
                    state, store, code, _ = self._jit_grow(
                        state, store, P2=P_new, max_steps=max_steps)
                    P_cur = P_new
                    code = int(code)
                    if code == RUNNING:
                        continue
                else:
                    _log_cap(P_cur, None)
            break

        # ONE packed transfer for the whole path record; the [2304]-wide
        # det arrays transfer lazily (root multi-instance accept only)
        rec = _unpack_record(self._jit_pack(state), P_cur)

        def accept_info():
            logits = 1.0 / (1.0 + np.exp(-np.asarray(det_logits,
                                                     np.float32)))
            bbox = [int(v) for v in rec["p_bbox"][rec["n"] - 1]]
            return np.asarray(det_boxes, np.float32), logits, bbox

        return _finalize(rec, code, accept_info, confidence_low,
                         ctx_cues, path_out)

    # -- batched fused searches -------------------------------------------

    def _bucket_b(self, n: int) -> int:
        for b in self.BATCH_BUCKETS:
            if n <= b:
                return b
        return self.BATCH_BUCKETS[-1]

    def search_many(self, images, names, smallest_sizes,
                    confidence_high: float = 0.5,
                    confidence_low: float = 0.3,
                    target_cue_threshold: float = 6.0,
                    target_cue_threshold_decay: float = 0.7,
                    target_cue_threshold_minimum: float = 3.0,
                    max_steps: Optional[int] = None):
        """B searches concurrently, each whole-search-on-device, the VSM
        weight reads shared across them (fused_search_batched). Searches
        are independent — results match per-search `search` exactly.
        All images must land in the SAME canvas bucket (the grouped
        dispatcher chunks by bucket); batch sizes pad up to BATCH_BUCKETS
        with a repeated row. Returns a list of visual_search tuples."""
        import numpy as np

        from .engine import _round128
        from .policy import PatchRef, context_phrase

        n = len(images)
        if n > self.BATCH_BUCKETS[-1]:
            out = []
            for a in range(0, n, self.BATCH_BUCKETS[-1]):
                b = a + self.BATCH_BUCKETS[-1]
                out.extend(self.search_many(
                    images[a:b], names[a:b], smallest_sizes[a:b],
                    confidence_high, confidence_low,
                    target_cue_threshold, target_cue_threshold_decay,
                    target_cue_threshold_minimum, max_steps))
            return out
        if n == 1:
            return [self.search(
                images[0], names[0], smallest_size=smallest_sizes[0],
                confidence_high=confidence_high,
                confidence_low=confidence_low,
                target_cue_threshold=target_cue_threshold,
                target_cue_threshold_decay=target_cue_threshold_decay,
                target_cue_threshold_minimum=target_cue_threshold_minimum,
                max_steps=max_steps)]
        eng = self.engine
        B = self._bucket_b(n)
        pad = B - n
        images = list(images) + [images[0]] * pad
        names = list(names) + [names[0]] * pad
        smallest = list(smallest_sizes) + [smallest_sizes[0]] * pad

        canvases = [eng._canvas(im) for im in images]
        shapes = {c.shape for c in canvases}
        assert len(shapes) == 1, \
            f"search_many needs one canvas bucket, got {shapes}"
        canvases = jnp.stack(canvases)
        Hc, Wc = canvases.shape[1:3]

        trips = [self._prompt_layouts(nm) for nm in names]
        bucket = max(t[2] for t in trips)
        if len({t[2] for t in trips}) > 1:  # re-pad to one shared bucket
            from ..multimodal.splicing import build_layout
            from .policy import context_question as _cq

            def mk(ids):
                return build_layout(ids, bucket,
                                    n_long=eng.cfg.image_tokens,
                                    n_short=0, image_long=True)
            trips = [(mk(self._question_ids(
                          f"Please locate the {nm} in this image.")),
                      mk(self._question_ids(_cq(nm))), bucket)
                     for nm in names]
        cache_len = bucket + _round128(eng.max_new_tokens + eng.spec_chunk)
        draft = None
        if eng._draft_row is not None:
            draft = jnp.asarray(np.tile(eng._draft_row[None], (B, 1)))

        state_list = [policy_state_init(im.width, im.height, self.P)
                      for im in images]
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *state_list)
        stores = jnp.zeros((B, self.P, Hc, Wc), jnp.float32)
        codes_np = np.zeros((B,), np.int32)
        # [3, B, S] stacked layouts (CTXSEG rows start as detect
        # placeholders, rewritten per context event)
        text3 = np.stack([np.stack([t[0].text_ids for t in trips]),
                          np.stack([t[1].text_ids for t in trips]),
                          np.stack([t[0].text_ids for t in trips])])
        feat3 = np.stack([np.stack([t[0].feat_idx for t in trips]),
                          np.stack([t[1].feat_idx for t in trips]),
                          np.stack([t[0].feat_idx for t in trips])])
        isf3 = np.stack([np.stack([t[0].is_feat for t in trips]),
                         np.stack([t[1].is_feat for t in trips]),
                         np.stack([t[0].is_feat for t in trips])])
        lens3 = np.asarray([[t[0].length for t in trips],
                            [t[1].length for t in trips],
                            [t[0].length for t in trips]], np.int32)
        smallest_v = jnp.asarray(smallest, jnp.int32)
        ies = eng.cfg.sam.image_embedding_size
        mh, mw = ies[0] * 4, ies[1] * 4

        ctx_cues = [dict() for _ in range(B)]
        pending = np.zeros((B,), bool)
        det_stash = []   # (active-rows mask, det_logits dev, det_boxes
        #                  dev) per fused call: a row's det outputs come
        #                  from the LAST call it was active in
        while True:
            was_running = codes_np == RUNNING
            states, stores, exit_recs, det_l, det_b = self._jit_fused_b(
                eng.params, eng.cfg, canvases, states, stores,
                jnp.asarray(codes_np), jnp.asarray(text3),
                jnp.asarray(feat3), jnp.asarray(isf3),
                jnp.asarray(lens3), draft, jnp.asarray(pending),
                smallest_v,
                confidence_high, target_cue_threshold,
                target_cue_threshold_decay, target_cue_threshold_minimum,
                loc_token_id=eng.loc_token_id,
                max_new_tokens=eng.max_new_tokens, eos_id=eng.eos_id,
                cache_len=cache_len, compute_dtype=eng.compute_dtype,
                spec_chunk=eng.spec_chunk, max_steps=max_steps,
                kv_int8=getattr(eng, "kv_int8", False))
            det_stash.append((was_running, det_l, det_b))
            recs = np.asarray(exit_recs)      # ONE fetch per fused call
            codes_np = recs[:, 0].astype(np.int32).copy()
            pending = np.zeros((B,), bool)
            ctx_rows = np.where(codes_np == NEED_CTX)[0]
            if len(ctx_rows) == 0:
                break
            # context answers were decoded IN-PROGRAM (CTXQ iterations
            # riding the batched generate); parse each phrase, write the
            # rows' CTXSEG layouts and re-enter ONCE for all of them
            overflow = []
            for i in ctx_rows:
                answer = self._decode_answer(
                    recs[i, 7:7 + int(recs[i, 2])])
                phrase = context_phrase(answer, names[i])
                ctx_cues[i][int(recs[i, 1]) - 1] = answer + "#" + phrase
                seg_lay = self._seg_layout(phrase, bucket)
                if seg_lay is None:
                    overflow.append((i, phrase))
                    continue
                text3[CTXSEG_ROW, i] = seg_lay.text_ids
                feat3[CTXSEG_ROW, i] = seg_lay.feat_idx
                isf3[CTXSEG_ROW, i] = seg_lay.is_feat
                lens3[CTXSEG_ROW, i] = seg_lay.length
                pending[i] = True
                codes_np[i] = RUNNING
            if overflow:
                # phrases too long for the shared bucket: serve those
                # events as one host wave (rare; any phrase length works)
                patches = []
                for i, _ in overflow:
                    bbox = [int(v) for v in recs[i, 3:7]]
                    p = PatchRef(images[i], bbox)
                    patches.append(p if eng.wants_patch_refs else p.pil())
                out, _ = eng._run_many(
                    patches,
                    [f"Please locate the {ph} in this image."
                     for _, ph in overflow])
                rows = np.asarray([i for i, _ in overflow], np.int32)
                # scatter the [mh,mw] ctx masks on DEVICE — fetching each
                # 192x192 f32 row through the relay (~70 KB/s) would cost
                # ~2 s/row; loc_valid is a tiny fetch
                ctx_low = jnp.zeros((B, mh, mw), jnp.float32).at[
                    jnp.asarray(rows)].set(
                    out.mask_logits[:len(rows)].astype(jnp.float32))
                valid_np = np.asarray(out.loc_valid[:len(rows)])
                ctx_valid = np.zeros((B,), bool)
                ctx_mask = np.zeros((B,), bool)
                for j, (i, _) in enumerate(overflow):
                    ctx_valid[i] = bool(valid_np[j])
                    ctx_mask[i] = True
                states, stores, codes_d = self._jit_ctx_b(
                    states, stores, jnp.asarray(codes_np),
                    ctx_low, jnp.asarray(ctx_valid),
                    jnp.asarray(ctx_mask), smallest_v,
                    target_cue_threshold, target_cue_threshold_decay,
                    target_cue_threshold_minimum, max_steps=max_steps)
                codes_np = np.asarray(codes_d).astype(np.int32).copy()
            if not (np.any(codes_np == RUNNING) or np.any(pending)):
                break

        packed = np.asarray(self._jit_pack_b(states))
        results = []
        for b in range(n):
            if (int(codes_np[b]) == MAX_STEPS and self.grow_limit > self.P
                    and (max_steps is None or max_steps > self.P)):
                # the shared batched program is sized P; a row that
                # outgrew it re-runs through the growable serial path
                # (searches are independent — the result is what the
                # batched run would have produced with a larger P)
                _LOG.info("batched fused search row %d outgrew P=%d; "
                          "re-running serially with growth", b, self.P)
                results.append(self.search(
                    images[b], names[b], smallest_size=smallest[b],
                    confidence_high=confidence_high,
                    confidence_low=confidence_low,
                    target_cue_threshold=target_cue_threshold,
                    target_cue_threshold_decay=target_cue_threshold_decay,
                    target_cue_threshold_minimum=(
                        target_cue_threshold_minimum),
                    max_steps=max_steps))
                continue
            rec = _unpack_record(packed[b], self.P)

            def accept_info(b=b, rec=rec):
                for mask, dl, db in reversed(det_stash):
                    if mask[b]:
                        logits = 1.0 / (1.0 + np.exp(
                            -np.asarray(dl[b], np.float32)))
                        bbox = [int(v)
                                for v in rec["p_bbox"][rec["n"] - 1]]
                        return np.asarray(db[b], np.float32), logits, bbox
                raise AssertionError("accept without an active fused call")

            results.append(_finalize(rec, int(codes_np[b]), accept_info,
                                     confidence_low, ctx_cues[b], None))
        return results


def warmup_compiled(comp: CompiledVSMSearch,
                    canvas_sizes=((512, 512),),
                    batch_buckets=(1, 2, 4), log=print):
    """Pre-compile the fused whole-search programs per (canvas bucket x
    batch bucket x PROMPT bucket) so no live search stalls on a 30-70 s
    remote compile (serve.server --warmup --compiled). The fused program
    is additionally keyed by the search's shared token bucket (the max of
    its detect and context-question prompts; text_ids shape + cache_len),
    so each prompt bucket gets a filler object name long enough to land
    in it — a long live object name must not compile mid-request. Warm
    searches use smallest_size >= the image side, so each exits after ONE
    step (root too small to split -> queue empty). Context-cue events
    compile NOTHING lazily: the answer decode, segment and push run
    inside these same fused programs (only the rare over-bucket segment
    phrase falls back to engine waves, and the growth programs for
    paths > P are small policy-only graphs)."""
    import numpy as np
    from PIL import Image

    from .batched import _filler_for_bucket

    eng = comp.engine

    def _detect_len(name):
        # the fused bucket is shared by the detect and ctx-question
        # prompts — size fillers by the same rule _prompt_layouts uses
        from .policy import context_question
        det = comp._question_ids(f"Please locate the {name} in this "
                                 f"image.")
        q = comp._question_ids(context_question(name))
        return max(len(det), len(q)) - 1 + eng.cfg.image_tokens

    names = ["warm object"]
    bks = list(eng.prompt_buckets)
    for lo, hi in zip(bks[:-1], bks[1:]):
        filler = _filler_for_bucket(_detect_len, lo, hi)
        if filler is None:
            if log:
                log(f"[warmup] compiled: no filler name reaches prompt "
                    f"bucket {hi}; that bucket will compile lazily")
        else:
            names.append(filler)

    rng = np.random.RandomState(0)
    for h, w in canvas_sizes:
        imgs = [Image.fromarray(rng.randint(0, 255, (h, w, 3),
                                            dtype=np.uint8))
                for _ in range(max(batch_buckets))]
        for b in batch_buckets:
            for name in names:
                comp.search_many(imgs[:b], [name] * b, [max(h, w)] * b)
            if log:
                log(f"[warmup] compiled search canvas {h}x{w} B={b} "
                    f"({len(names)} prompt buckets) compiled")
