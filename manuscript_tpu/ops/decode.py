"""Quad decoding from EAST score/geometry maps.

The reference decodes with a per-pixel Python loop plus a coordinate-
quantization dedup pass (reference: src/manuscript/detectors/_east/
utils.py:328-381). Semantics: a q×q cell is a candidate when ANY of its
pixels clears the score threshold; the candidate's score and 8 geometry
offsets are sampled at the cell-center pixel; vertex v_i of the quad is
(center + offset_i) * scale in input-image pixels.

Here that becomes a single fixed-shape tensor program (`decode_cells_jax`)
that runs inside the detector's jitted device graph — no data-dependent
shapes, a (Hc, Wc) validity mask carries the dynamic candidate count. A
vectorized numpy twin (`decode_quads_numpy`) provides host parity testing and
a fallback.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cell_centers(size: int, q: int) -> np.ndarray:
    n_cells = -(-size // q)  # ceil
    centers = np.arange(n_cells) * q + q // 2
    return np.minimum(centers, size - 1)


@partial(jax.jit, static_argnames=("quantization", "scale"))
def decode_cells_jax(
    score_map: jnp.ndarray,
    geo_map: jnp.ndarray,
    score_thresh: float,
    quantization: int = 1,
    scale: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device quad decode.

    Args:
      score_map: (H, W) float scores in [0, 1].
      geo_map:   (H, W, 8) vertex offsets in map-scale pixels.
      score_thresh: candidate threshold (traced — no recompile per sweep).
      quantization: cell size q (static).
      scale: map→image scale factor (static; 4.0 for quarter-res maps).

    Returns:
      quads: (Hc, Wc, 8) vertex coordinates in input-image pixels.
      scores: (Hc, Wc) cell-center scores.
      valid: (Hc, Wc) bool — any pixel in the cell above threshold.
    """
    h, w = score_map.shape
    q = quantization
    if q > 1:
        hc, wc = -(-h // q), -(-w // q)
        pad_h, pad_w = hc * q - h, wc * q - w
        padded = jnp.pad(
            score_map, ((0, pad_h), (0, pad_w)), constant_values=-jnp.inf
        )
        cell_max = padded.reshape(hc, q, wc, q).max(axis=(1, 3))
        cy = jnp.asarray(_cell_centers(h, q))
        cx = jnp.asarray(_cell_centers(w, q))
    else:
        hc, wc = h, w
        cell_max = score_map
        cy = jnp.arange(h)
        cx = jnp.arange(w)

    valid = cell_max > score_thresh
    scores = score_map[cy[:, None], cx[None, :]]
    geo = geo_map[cy[:, None], cx[None, :], :]  # (Hc, Wc, 8)

    fx = cx[None, :, None].astype(geo.dtype)  # broadcast over rows
    fy = cy[:, None, None].astype(geo.dtype)
    dx = geo[:, :, 0::2]
    dy = geo[:, :, 1::2]
    vx = (fx + dx) * scale  # (Hc, Wc, 4)
    vy = (fy + dy) * scale
    quads = jnp.stack([vx, vy], axis=-1).reshape(hc, wc, 8)
    return quads, scores, valid


def compact_decoded(
    quads: np.ndarray, scores: np.ndarray, valid: np.ndarray
) -> np.ndarray:
    """Host-side compaction of the padded decode → (n, 9) candidate rows.

    Row order is row-major over cells (y, then x), matching the reference's
    np.where/np.unique ordering so LANMS sees candidates identically.
    """
    mask = np.asarray(valid)
    if not mask.any():
        return np.zeros((0, 9), dtype=np.float32)
    q = np.asarray(quads)[mask]
    s = np.asarray(scores)[mask]
    return np.concatenate([q, s[:, None]], axis=1).astype(np.float32)


def topk_candidates(
    quads: jnp.ndarray,  # (Hc, Wc, 8)
    scores: jnp.ndarray,  # (Hc, Wc)
    valid: jnp.ndarray,  # (Hc, Wc) bool
    max_candidates: int,
) -> jnp.ndarray:
    """Device-side compaction: keep the top-K valid cells by score.

    Returns (K, 9) rows; invalid slots carry score −1 so the host can drop
    them with a single comparison. Keeps the detector→host transfer at
    K·36 bytes instead of the full map (the link's d2h path is the
    bottleneck, ~30 ms + 46 MB/s — see SURVEY §6 driver notes).
    """
    flat_scores = jnp.where(valid, scores, -1.0).reshape(-1)
    k = min(max_candidates, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    top_quads = quads.reshape(-1, 8)[top_idx]
    return jnp.concatenate([top_quads, top_scores[:, None]], axis=-1)


def compact_candidates(
    quads: jnp.ndarray,  # (Hc, Wc, 8)
    scores: jnp.ndarray,  # (Hc, Wc)
    valid: jnp.ndarray,  # (Hc, Wc) bool
    max_candidates: int,
) -> jnp.ndarray:
    """Device-side compaction without the top-k sort: scatter valid cells
    into the first free slots in raster order (cumsum positioning).

    This matches the reference decode more closely than ``topk_candidates``:
    the reference keeps EVERY above-threshold cell (utils.py:340-364), so
    under capacity the two are identical sets and an O(n) cumsum+scatter
    replaces a ~25 ms full sort. Over capacity the tail of the raster
    (bottom of the page) is dropped rather than the lowest scores — a
    capacity overflow is a mis-calibrated threshold either way.

    Returns (K, 9) rows; unused slots carry score −1.
    """
    flat_valid = valid.reshape(-1)
    n_cells = flat_valid.shape[0]
    k = min(max_candidates, n_cells)
    slot = jnp.cumsum(flat_valid) - 1
    within = flat_valid & (slot < k)
    target = jnp.where(within, slot, k)
    rows = jnp.concatenate(
        [quads.reshape(-1, 8), scores.reshape(-1, 1)], axis=-1
    )
    out = jnp.full((k + 1, 9), -1.0, rows.dtype).at[target].set(rows)[:k]
    live = jnp.arange(k) < jnp.sum(within)
    return out.at[:, 8].set(jnp.where(live, out[:, 8], -1.0))


def compact_topk(cands: np.ndarray) -> np.ndarray:
    """Host: strip the −1-score padding rows from topk_candidates output."""
    cands = np.asarray(cands)
    return cands[cands[:, 8] >= 0.0].astype(np.float32)


def decode_quads_numpy(
    score_map: np.ndarray,
    geo_map: np.ndarray,
    score_thresh: float,
    scale: float,
    quantization: int = 1,
) -> np.ndarray:
    """Vectorized host decode with identical semantics; returns (n, 9)."""
    if score_map.ndim == 3 and score_map.shape[0] == 1:
        score_map = score_map[0]
    ys, xs = np.where(score_map > score_thresh)
    if len(ys) == 0:
        return np.zeros((0, 9), dtype=np.float32)

    if quantization > 1:
        q = quantization
        ys_q = (ys // q) * q + q // 2
        xs_q = (xs // q) * q + q // 2
        coords = np.unique(np.column_stack([ys_q, xs_q]), axis=0)
        ys, xs = coords[:, 0], coords[:, 1]
        ys = np.minimum(ys, score_map.shape[0] - 1)
        xs = np.minimum(xs, score_map.shape[1] - 1)

    offs = geo_map[ys, xs]  # (n, 8)
    vx = (xs[:, None] + offs[:, 0::2]) * scale
    vy = (ys[:, None] + offs[:, 1::2]) * scale
    quads = np.stack([vx, vy], axis=-1).reshape(len(ys), 8)
    scores = score_map[ys, xs]
    return np.concatenate([quads, scores[:, None]], axis=1).astype(np.float32)
