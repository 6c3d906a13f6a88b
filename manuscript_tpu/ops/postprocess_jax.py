"""On-device detector post-processing (fused after device LANMS).

Vectorized equivalents of ops/boxes.py (host): inverse-shrink expansion,
rescale to the original resolution, fully-contained-box removal, area-
anomaly filtering, axis alignment — all masked fixed-shape ops over the
(max_out, 9) LANMS output so the detector's only device→host transfer is
the final box tensor.

Containment semantics note: the host scans boxes area-ascending and only
ever removes the box being scanned, so a box is removed iff SOME strictly
larger box contains all four of its vertices — an order-free rule that
vectorizes exactly (reference: src/manuscript/detectors/_east/
infer.py:194-214).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def expand_quads_jax(
    quads: jnp.ndarray, expand_w: float, expand_h: float
) -> jnp.ndarray:
    """Push vertices outward along averaged edge normals; quads (M, 4, 2)."""
    x, y = quads[..., 0], quads[..., 1]
    area = jnp.sum(
        x * jnp.roll(y, -1, axis=1) - jnp.roll(x, -1, axis=1) * y, axis=1
    )
    sign = jnp.where(area == 0, 1.0, jnp.sign(area))[:, None, None]

    p_prev = jnp.roll(quads, 1, axis=1)
    p_next = jnp.roll(quads, -1, axis=1)
    edge1 = quads - p_prev
    edge2 = p_next - quads
    len1 = jnp.linalg.norm(edge1, axis=2, keepdims=True)
    len2 = jnp.linalg.norm(edge2, axis=2, keepdims=True)

    n1 = sign * jnp.stack([edge1[..., 1], -edge1[..., 0]], axis=2) / (len1 + 1e-6)
    n2 = sign * jnp.stack([edge2[..., 1], -edge2[..., 0]], axis=2) / (len2 + 1e-6)
    n_avg = n1 + n2
    norm = jnp.linalg.norm(n_avg, axis=2, keepdims=True)
    n_avg = jnp.where(norm > 0, n_avg / jnp.where(norm == 0, 1.0, norm), 0.0)

    offset = jnp.minimum(len1, len2)
    scale_xy = jnp.asarray([expand_w, expand_h], quads.dtype).reshape(1, 1, 2)
    return quads + scale_xy * offset * n_avg


def _points_in_quads(quads: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """inside[i, j] = all 4 vertices of quad i lie inside (or on) quad j."""
    a = quads  # (M, 4, 2) polygon vertices
    b = jnp.roll(quads, -1, axis=1)
    edge = b - a  # (M, 4, 2)
    # rel[i, j, v, e] = vertex v of quad i relative to edge e of quad j
    rel = quads[:, None, :, None, :] - a[None, :, None, :, :]
    cross = (
        edge[None, :, None, :, 0] * rel[..., 1]
        - edge[None, :, None, :, 1] * rel[..., 0]
    )  # (M, M, 4verts, 4edges)
    inside_ccw = jnp.all(cross >= -eps, axis=-1)
    inside_cw = jnp.all(cross <= eps, axis=-1)
    per_vertex = inside_ccw | inside_cw  # (M, M, 4)
    return jnp.all(per_vertex, axis=-1)  # (M, M)


def quad_areas(quads: jnp.ndarray) -> jnp.ndarray:
    x, y = quads[..., 0], quads[..., 1]
    return (
        jnp.abs(
            jnp.sum(x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y, axis=-1)
        )
        / 2.0
    )


@partial(
    jax.jit,
    static_argnames=("axis_aligned", "remove_anomalies", "anomaly_min_count"),
)
def postprocess_boxes_jax(
    boxes: jnp.ndarray,  # (M, 9) LANMS output, score-desc, zeros past count
    count: jnp.ndarray,  # scalar int
    expand_w: float,
    expand_h: float,
    scale_x: jnp.ndarray,
    scale_y: jnp.ndarray,
    axis_aligned: bool = True,
    remove_anomalies: bool = True,
    anomaly_sigma: float = 5.0,
    anomaly_min_count: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expansion → rescale → containment filter → anomaly filter → axis
    alignment, under a validity mask. Returns (boxes (M, 9), valid (M,))."""
    m = boxes.shape[0]
    valid = jnp.arange(m) < count
    quads = boxes[:, :8].reshape(m, 4, 2)
    scores = boxes[:, 8]

    quads = expand_quads_jax(quads, expand_w, expand_h)
    quads = quads * jnp.stack([scale_x, scale_y]).reshape(1, 1, 2)

    # containment: drop i if a strictly larger valid j contains it
    areas = quad_areas(quads)
    inside = _points_in_quads(quads)
    larger = areas[None, :] > areas[:, None] + 1e-6
    not_self = ~jnp.eye(m, dtype=bool)
    contained = jnp.any(
        inside & larger & not_self & valid[None, :], axis=1
    )
    valid = valid & ~contained

    if remove_anomalies:
        n_valid = jnp.sum(valid)
        vf = valid.astype(quads.dtype)
        mean = jnp.sum(areas * vf) / jnp.maximum(n_valid, 1)
        var = jnp.sum(((areas - mean) ** 2) * vf) / jnp.maximum(n_valid, 1)
        std = jnp.sqrt(var)
        thresh = mean + anomaly_sigma * std
        anomaly_keep = areas <= thresh
        # inert when few boxes, zero spread, or it would drop everything
        apply = (
            (n_valid > anomaly_min_count)
            & (std > 0)
            & jnp.any(anomaly_keep & valid)
        )
        valid = jnp.where(apply, valid & anomaly_keep, valid)

    if axis_aligned:
        x_min = quads[..., 0].min(axis=1)
        x_max = quads[..., 0].max(axis=1)
        y_min = quads[..., 1].min(axis=1)
        y_max = quads[..., 1].max(axis=1)
        quads = jnp.stack(
            [
                jnp.stack([x_min, y_min], -1),
                jnp.stack([x_max, y_min], -1),
                jnp.stack([x_max, y_max], -1),
                jnp.stack([x_min, y_max], -1),
            ],
            axis=1,
        )

    out = jnp.concatenate([quads.reshape(m, 8), scores[:, None]], axis=1)
    return out, valid
