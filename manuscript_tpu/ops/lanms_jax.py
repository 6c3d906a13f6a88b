"""Locality-aware NMS — on-device (JAX) implementation.

Same semantics as ops/lanms.py (the numpy/C++ host kernels; ultimately the
reference's Numba kernels, src/manuscript/detectors/_east/lanms.py:133-207)
re-expressed as fixed-shape tensor programs:

* quad∩quad IoU = batched Sutherland–Hodgman clipping over a static 8-slot
  vertex buffer with per-polygon counts; the per-edge emit/compact step is a
  one-hot contraction (VPU-friendly, no data-dependent shapes);
* the inherently serial x-sorted weighted merge is a ``lax.scan`` carrying
  the "current merged quad" plus a fixed-capacity output buffer;
* standard NMS = precomputed pairwise IoU matrix + a greedy suppression scan
  over the score-descending order.

Everything runs under one jit; inputs/outputs are padded — candidates carry
score −1 when invalid, outputs beyond the returned count are zeros. f32
(the host path is f64; the parity tests allow tolerance-level differences,
SURVEY.md §7 hard-parts #1).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_SLOTS = 8  # max vertices of quad∩quad under S-H clipping (4 + 4 edges)


def _line_intersection(p1, p2, a, b):
    """Intersection of lines (p1,p2) and (a,b), batched over leading dims;
    parallel lines return p1."""
    d1 = p2 - p1
    d2 = b - a
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    ca = a - p1
    t = (ca[..., 0] * d2[..., 1] - ca[..., 1] * d2[..., 0]) / jnp.where(
        denom == 0, 1.0, denom
    )
    inter = p1 + t[..., None] * d1
    return jnp.where((denom == 0)[..., None], p1, inter)


def _clip_batch(polys, counts, a, b):
    """Clip P polygons against the half-plane left of edge a→b.

    Gather-free formulation: polygons are REPETITION-PADDED — slots past the
    live vertex count repeat the last vertex, so the previous-vertex lookup
    is a static roll (slot 0's prev = slot 7 = the true last vertex) and
    zero-length pad edges are inert for both crossing detection and area.
    Duplicate-vertex slots are suppressed from emission, keeping the true
    Sutherland–Hodgman output (≤ 8 vertices for quad∩quad) in capacity.

    polys: (P, 8, 2) repetition-padded; counts: (P,); a, b: (P, 2).
    Returns (new_polys repetition-padded, new_counts).
    """
    p = polys.shape[0]
    curr = polys
    prev = jnp.roll(polys, 1, axis=1)

    ab = b - a  # (P, 2)

    def side(pts):  # (P, 8)
        return ab[:, None, 0] * (pts[..., 1] - a[:, None, 1]) - ab[:, None, 1] * (
            pts[..., 0] - a[:, None, 0]
        )

    curr_in = side(curr) >= 0
    prev_in = side(prev) >= 0
    is_dup = jnp.all(curr == prev, axis=-1)  # pad slots / repeated vertices

    inter = _line_intersection(prev, curr, a[:, None, :], b[:, None, :])

    # per slot: emit intersection first (on edge crossing), then curr (if in)
    emit_inter = (curr_in ^ prev_in) & ~is_dup
    emit_curr = curr_in & ~is_dup
    emits = jnp.stack([inter, curr], axis=2).reshape(p, 2 * _SLOTS, 2)
    emask = jnp.stack([emit_inter, emit_curr], axis=2).reshape(p, 2 * _SLOTS)

    pos = jnp.cumsum(emask, axis=1) - 1  # target slot per emit
    onehot = jax.nn.one_hot(
        jnp.where(emask, pos, _SLOTS), _SLOTS + 1, dtype=polys.dtype
    )[..., :_SLOTS]  # (P, 16, 8); masked emits land in the dumped column
    new_polys = jnp.einsum("peo,pec->poc", onehot, emits)
    new_counts = emask.sum(axis=1).astype(jnp.int32)

    # repetition-pad: fill slots ≥ count with the last emitted vertex
    slot = jax.lax.broadcasted_iota(jnp.int32, (p, _SLOTS), 1)
    live = slot < new_counts[:, None]
    is_last = slot == (new_counts - 1)[:, None]
    last_v = jnp.sum(new_polys * is_last[..., None], axis=1, keepdims=True)
    new_polys = jnp.where(live[..., None], new_polys, last_v)
    return new_polys, new_counts


def _padded_area(polys):
    """Shoelace area of repetition-padded polygons (P, 8, 2); pad edges are
    zero-length and the wrap (slot 7 → slot 0) is geometrically exact."""
    nxt = jnp.roll(polys, -1, axis=1)
    cross = polys[..., 0] * nxt[..., 1] - nxt[..., 0] * polys[..., 1]
    return jnp.abs(jnp.sum(cross, axis=1)) / 2.0


def _quad_area(q):
    """Shoelace area of (…, 4, 2) quads."""
    x, y = q[..., 0], q[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return jnp.abs(jnp.sum(x * yn - xn * y, axis=-1)) / 2.0


def quad_iou_pairs(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """IoU of paired quads: q1, q2 (P, 4, 2) → (P,)."""
    p = q1.shape[0]
    polys = jnp.concatenate(
        [q1, jnp.repeat(q1[:, 3:4], _SLOTS - 4, axis=1)], axis=1
    )  # repetition-padded
    counts = jnp.full((p,), 4, jnp.int32)
    for e in range(4):
        a = q2[:, e]
        b = q2[:, (e + 1) % 4]
        polys, counts = _clip_batch(polys, counts, a, b)
    inter = jnp.where(counts > 2, _padded_area(polys), 0.0)
    union = _quad_area(q1) + _quad_area(q2) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def quad_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a (N, 4, 2), b (M, 4, 2) → (N, M)."""
    n, m = a.shape[0], b.shape[0]
    a_rep = jnp.repeat(a, m, axis=0)
    b_rep = jnp.tile(b, (n, 1, 1))
    return quad_iou_pairs(a_rep, b_rep).reshape(n, m)


def _normalize_quad(ref, poly):
    """Best vertex ordering of ``poly`` against ``ref`` over all 8 cyclic/
    reflected permutations (forward orientations win ties)."""
    idx = jnp.arange(4)
    fwd = (idx[None, :] + idx[:, None]) % 4  # (start, i)
    bwd = (idx[:, None] - idx[None, :]) % 4
    orders = jnp.concatenate([fwd, bwd], axis=0)  # (8, 4)
    cands = poly[orders]  # (8, 4, 2)
    d = jnp.sum((cands - ref[None]) ** 2, axis=(1, 2))
    return cands[jnp.argmin(d)]


@partial(jax.jit, static_argnames=("max_out",))
def locality_aware_nms_jax(
    cands: jnp.ndarray, iou_threshold: jnp.ndarray, max_out: int = 1024
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device LANMS over padded candidates.

    cands: (K, 9) rows [x0..y3, score]; rows with score < 0 are padding.
    Returns (boxes (max_out, 9) score-descending, count). Rows past count
    are zero.
    """
    k = cands.shape[0]
    scores = cands[:, 8]
    valid = scores >= 0.0

    # x0-sort with invalid rows pushed to the end (stable, like the host)
    sort_key = jnp.where(valid, cands[:, 0], jnp.inf)
    order = jnp.argsort(sort_key, stable=True)
    quads = cands[:, :8].reshape(k, 4, 2)[order]
    sc = scores[order]
    val = valid[order]

    # ---- sequential weighted merge (lax.scan) ----
    def merge_step(carry, inp):
        out_p, out_s, m, cur_p, cur_s, cur_w, has_cur = carry
        q, s, v = inp

        iou = quad_iou_pairs(q[None], cur_p[None])[0]
        do_merge = v & has_cur & (iou > iou_threshold)

        aligned = _normalize_quad(cur_p, q)
        tot = cur_w + s
        merged_p = (cur_p * cur_w + aligned * s) / jnp.where(tot == 0, 1.0, tot)

        # close the current quad when the new one doesn't merge
        close = v & has_cur & ~do_merge
        slot = jnp.minimum(m, max_out - 1)
        out_p = jnp.where(close, out_p.at[slot].set(cur_p), out_p)
        out_s = jnp.where(close, out_s.at[slot].set(cur_s), out_s)
        m = m + close.astype(jnp.int32)

        new_cur_p = jnp.where(do_merge, merged_p, jnp.where(v, q, cur_p))
        new_cur_s = jnp.where(
            do_merge, jnp.maximum(cur_s, s), jnp.where(v, s, cur_s)
        )
        new_cur_w = jnp.where(do_merge, tot, jnp.where(v, s, cur_w))
        has_cur = has_cur | v
        return (out_p, out_s, m, new_cur_p, new_cur_s, new_cur_w, has_cur), None

    init = (
        jnp.zeros((max_out, 4, 2), cands.dtype),
        jnp.full((max_out,), -jnp.inf, cands.dtype),
        jnp.int32(0),
        jnp.zeros((4, 2), cands.dtype),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.bool_(False),
    )
    (out_p, out_s, m, cur_p, cur_s, _, has_cur), _ = jax.lax.scan(
        merge_step, init, (quads, sc, val)
    )
    slot = jnp.minimum(m, max_out - 1)
    out_p = jnp.where(has_cur, out_p.at[slot].set(cur_p), out_p)
    out_s = jnp.where(has_cur, out_s.at[slot].set(cur_s), out_s)
    m = m + has_cur.astype(jnp.int32)

    merged_valid = jnp.arange(max_out) < m
    return _standard_nms(out_p, out_s, merged_valid, iou_threshold, cands.dtype)


def _standard_nms(out_p, out_s, merged_valid, iou_threshold, dtype):
    """Exact greedy NMS over merged quads, as a fixpoint iteration.

    The greedy solution satisfies the unique fixpoint
      kept[i] = valid[i] ∧ ¬∃ j<i (score order): kept[j] ∧ IoU[j,i] > t.
    Since kept[i] depends only on kept[j] for j<i, iterating from
    kept = valid fixes all rows of dependency depth ≤ t after t sweeps —
    convergence in suppression-chain depth (typically 2–4) iterations
    instead of a max_out-step sequential scan. Each sweep is one masked
    (M, M) reduction — MXU/VPU-friendly.

    The expensive part is the quad-IoU matrix: a dense M×M
    Sutherland–Hodgman clip is ~1M polygon clips at M=1024 — ~90 ms of
    HBM-bound elementwise work. Exact clipping is only *needed* where it
    could flip a decision, and quad IoU is bounded above by
    bbox-intersection / max(area_i, area_j) (quad ∩ ⊆ bbox ∩,
    union ≥ the larger quad). So: compute the cheap bound for all pairs,
    compact the few pairs above threshold (cumsum-scatter, fixed capacity
    16·M), and clip only those. Overflow pairs — beyond capacity, i.e. a
    pathological all-overlapping box field — fall back to the upper bound
    (conservatively suppressing); real post-merge fields have ≪ 16
    above-threshold neighbours per box.
    """
    max_out = out_p.shape[0]
    pair_cap = 16 * max_out

    nms_key = jnp.where(merged_valid, out_s, -jnp.inf)
    nms_order = jnp.argsort(-nms_key, stable=True)
    quads_sorted = out_p[nms_order]  # (M, 4, 2), score-descending
    valid_sorted = merged_valid[nms_order]

    # bbox-overlap upper bound on quad IoU, all pairs
    x1 = quads_sorted[..., 0].min(axis=1)
    x2 = quads_sorted[..., 0].max(axis=1)
    y1 = quads_sorted[..., 1].min(axis=1)
    y2 = quads_sorted[..., 1].max(axis=1)
    areas = _quad_area(quads_sorted)
    iw = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :]),
        0.0,
    )
    ih = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :]),
        0.0,
    )
    amax = jnp.maximum(areas[:, None], areas[None, :])
    ub = (iw * ih) / jnp.maximum(amax, 1e-12)

    idx = jnp.arange(max_out)
    lower = idx[None, :] < idx[:, None]  # j strictly earlier than i
    cand = (
        (ub > iou_threshold)
        & lower
        & valid_sorted[:, None]
        & valid_sorted[None, :]
    )

    # compact candidate pairs (row-major) and clip exactly only those
    flat = cand.reshape(-1)
    slot = jnp.cumsum(flat) - 1
    within = flat & (slot < pair_cap)
    pair_idx = (
        jnp.zeros((pair_cap + 1,), jnp.int32)
        .at[jnp.where(within, slot, pair_cap)]
        .set(jnp.arange(max_out * max_out, dtype=jnp.int32))[:pair_cap]
    )
    pi, pj = pair_idx // max_out, pair_idx % max_out
    live_pair = jnp.arange(pair_cap) < jnp.sum(within)
    exact = quad_iou_pairs(quads_sorted[pi], quads_sorted[pj])  # (P,)
    supp_pair = live_pair & (exact > iou_threshold)

    suppressor = (
        jnp.zeros((max_out * max_out + 1,), bool)
        .at[jnp.where(live_pair, pair_idx, max_out * max_out)]
        .set(supp_pair)[:-1]
        .reshape(max_out, max_out)
    )
    # overflow pairs keep the conservative upper-bound decision
    overflow = cand & (slot.reshape(max_out, max_out) >= pair_cap)
    suppressor = suppressor | overflow

    def cond(state):
        _, changed, it = state
        return changed & (it < max_out)

    def body(state):
        kept, _, it = state
        new = valid_sorted & ~jnp.any(suppressor & kept[None, :], axis=1)
        return new, jnp.any(new != kept), it + 1

    kept, _, _ = jax.lax.while_loop(
        cond, body, (valid_sorted, jnp.bool_(True), jnp.int32(0))
    )

    # compact kept rows to the front, preserving score-descending order;
    # non-kept rows scatter into a dump slot past the output
    kept_pos = jnp.cumsum(kept) - 1
    target = jnp.where(kept, kept_pos, max_out)
    n_kept = kept.sum()

    boxes_sorted = jnp.concatenate(
        [quads_sorted.reshape(max_out, 8), out_s[nms_order, None]], axis=1
    )
    out = jnp.zeros((max_out + 1, 9), dtype)
    out = out.at[target].set(boxes_sorted)
    return out[:max_out], n_kept


@partial(jax.jit, static_argnames=("max_out",))
def locality_aware_nms_parallel(
    cands: jnp.ndarray, iou_threshold: jnp.ndarray, max_out: int = 1024
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel device LANMS — the fused-pipeline hot path.

    Same structure as ``locality_aware_nms_jax`` but the inherently serial
    x-sorted weighted merge is replaced by a segmented formulation that has
    no sequential scan at all:

      1. IoU between each candidate and its predecessor (one vectorized
         batch of quad clips);
      2. chain-break where that IoU ≤ threshold → segment ids by cumsum;
      3. per-segment score-weighted vertex average via ``segment_sum``.

    Semantics delta vs the host/scan kernels (documented, tested): the host
    merges candidate i into the RUNNING weighted average and compares IoU
    against it; here the merge test uses the PREVIOUS candidate. For EAST
    decode outputs — near-duplicate quads from adjacent cells along a text
    line — the two chains agree except at borderline-IoU links. Vertex
    alignment is likewise pairwise against the predecessor's raw quad
    (decode emits consistent vertex orderings, so it is normally identity).
    """
    k = cands.shape[0]
    scores = cands[:, 8]
    valid = scores >= 0.0

    sort_key = jnp.where(valid, cands[:, 0], jnp.inf)
    order = jnp.argsort(sort_key, stable=True)
    quads = cands[:, :8].reshape(k, 4, 2)[order]
    sc = jnp.where(valid[order], scores[order], 0.0)
    val = valid[order]

    prev = jnp.concatenate([quads[:1], quads[:-1]], axis=0)
    aligned = jax.vmap(_normalize_quad)(prev, quads)

    iou_prev = quad_iou_pairs(quads[1:], quads[:-1])  # (k-1,)
    same = val[1:] & val[:-1] & (iou_prev > iou_threshold)
    brk = jnp.concatenate([jnp.ones((1,), bool), ~same])
    seg = jnp.cumsum(brk.astype(jnp.int32)) - 1
    seg = jnp.where(val, seg, k)  # invalid rows → dump segment

    w = sc
    vert_sum = jax.ops.segment_sum(
        aligned.reshape(k, 8) * w[:, None], seg, num_segments=k + 1
    )[:k]
    w_sum = jax.ops.segment_sum(w, seg, num_segments=k + 1)[:k]
    s_max = jax.ops.segment_max(
        jnp.where(val, sc, -jnp.inf), seg, num_segments=k + 1
    )[:k]
    seg_valid = w_sum > 0
    merged = vert_sum / jnp.maximum(w_sum, 1e-12)[:, None]

    # compact valid segments (x-sorted order) into the (max_out,) buffer
    pos = jnp.cumsum(seg_valid) - 1
    target = jnp.where(seg_valid & (pos < max_out), pos, max_out)
    out_p = (
        jnp.zeros((max_out + 1, 8), cands.dtype)
        .at[target]
        .set(merged)[:max_out]
        .reshape(max_out, 4, 2)
    )
    out_s = (
        jnp.full((max_out + 1,), -jnp.inf, cands.dtype)
        .at[target]
        .set(jnp.where(seg_valid, s_max, -jnp.inf))[:max_out]
    )
    m = jnp.minimum(jnp.sum(seg_valid), max_out)

    merged_valid = jnp.arange(max_out) < m
    return _standard_nms(out_p, out_s, merged_valid, iou_threshold, cands.dtype)
