"""Post-NMS box operations (host, vectorized numpy).

Covers the detector's post-processing chain (reference:
src/manuscript/detectors/_east/infer.py:134-233 and utils.py:384-422):
inverse-shrink expansion, rescale to original resolution, containment and
area-anomaly filters, axis alignment. All operate on (n, 9) arrays of
[x0..y3, score] rows.
"""

from __future__ import annotations

import numpy as np

from .geometry import polygon_area_batch


def expand_boxes(
    quads: np.ndarray, expand_w: float = 0.0, expand_h: float = 0.0
) -> np.ndarray:
    """Push each vertex outward along averaged edge normals.

    The per-vertex offset is min(adjacent edge lengths) scaled by the expand
    ratios — the inverse of the 0.3-shrink applied during label synthesis.
    """
    if len(quads) == 0 or (expand_w == 0 and expand_h == 0):
        return quads

    coords = quads[:, :8].reshape(-1, 4, 2).astype(np.float64)
    scores = quads[:, 8:9]

    x, y = coords[:, :, 0], coords[:, :, 1]
    area = np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1)
    sign = np.sign(area).reshape(-1, 1, 1)
    sign[sign == 0] = 1

    p_prev = np.roll(coords, 1, axis=1)
    p_next = np.roll(coords, -1, axis=1)

    edge1 = coords - p_prev
    edge2 = p_next - coords
    len1 = np.linalg.norm(edge1, axis=2, keepdims=True)
    len2 = np.linalg.norm(edge2, axis=2, keepdims=True)

    # Outward normals of both adjacent edges, then their normalized average.
    n1 = sign * np.stack([edge1[..., 1], -edge1[..., 0]], axis=2) / (len1 + 1e-6)
    n2 = sign * np.stack([edge2[..., 1], -edge2[..., 0]], axis=2) / (len2 + 1e-6)
    n_avg = n1 + n2
    norm = np.linalg.norm(n_avg, axis=2, keepdims=True)
    n_avg = np.divide(n_avg, norm, out=np.zeros_like(n_avg), where=norm > 0)

    offset = np.minimum(len1, len2)
    scale_xy = np.array([expand_w, expand_h], dtype=np.float64).reshape(1, 1, 2)
    new_coords = coords + scale_xy * offset * n_avg

    out = np.hstack([new_coords.reshape(-1, 8), scores])
    return out.astype(np.float32)


def scale_boxes(
    boxes: np.ndarray, from_size: int, orig_h: int, orig_w: int
) -> np.ndarray:
    """Rescale quad coordinates from the square inference canvas back to the
    original image resolution."""
    if len(boxes) == 0:
        return boxes
    scaled = boxes.copy()
    scaled[:, 0:8:2] *= orig_w / from_size
    scaled[:, 1:8:2] *= orig_h / from_size
    return scaled


def to_axis_aligned(quads: np.ndarray) -> np.ndarray:
    """Replace each quad by its axis-aligned bounding rectangle
    (x_min,y_min)→(x_max,y_min)→(x_max,y_max)→(x_min,y_max)."""
    if len(quads) == 0:
        return quads
    aligned = quads.copy()
    coords = aligned[:, :8].reshape(-1, 4, 2)
    x_min = coords[:, :, 0].min(axis=1)
    x_max = coords[:, :, 0].max(axis=1)
    y_min = coords[:, :, 1].min(axis=1)
    y_max = coords[:, :, 1].max(axis=1)
    rects = np.stack(
        [x_min, y_min, x_max, y_min, x_max, y_max, x_min, y_max], axis=1
    )
    aligned[:, :8] = rects
    return aligned


def remove_fully_contained(quads: np.ndarray) -> np.ndarray:
    """Drop any quad whose 4 vertices all lie inside a strictly larger quad.

    The reference scans area-ascending and only ever removes the quad being
    scanned, so larger quads are always still present when a smaller one is
    checked — making the rule order-free: remove i iff ∃j with
    area_j > area_i + 1e-6 containing all of i's vertices. That vectorizes
    to one pairwise tensor test (the reference's per-pair cv2 loop is
    O(n²) Python and melts down at thousands of boxes)."""
    n = len(quads)
    if n <= 1:
        return quads
    coords = quads[:, :8].reshape(-1, 4, 2).astype(np.float64)
    areas = polygon_area_batch(coords)

    # cheap O(N²·scalars) prefilter: containment requires bbox(i) ⊆ bbox(j)
    # (with slack) and area_j strictly larger
    x_min = coords[..., 0].min(1); x_max = coords[..., 0].max(1)
    y_min = coords[..., 1].min(1); y_max = coords[..., 1].max(1)
    slack = 1e-6
    pre = (
        (x_min[:, None] >= x_min[None, :] - slack)
        & (x_max[:, None] <= x_max[None, :] + slack)
        & (y_min[:, None] >= y_min[None, :] - slack)
        & (y_max[:, None] <= y_max[None, :] + slack)
        & (areas[None, :] > areas[:, None] + 1e-6)
    )
    np.fill_diagonal(pre, False)
    ii, jj = np.nonzero(pre)
    if len(ii) == 0:
        return quads

    # exact vertex-in-quad test, batched over the candidate pairs only
    pts = coords[ii]  # (P, 4, 2) vertices of the (maybe) inner quad
    poly = coords[jj]  # (P, 4, 2) candidate containers
    a = poly
    b = np.roll(poly, -1, axis=1)
    edge = b - a  # (P, 4edges, 2)
    rel = pts[:, :, None, :] - a[:, None, :, :]  # (P, 4verts, 4edges, 2)
    cross = edge[:, None, :, 0] * rel[..., 1] - edge[:, None, :, 1] * rel[..., 0]
    eps = 1e-9
    per_vertex = np.all(cross >= -eps, axis=-1) | np.all(cross <= eps, axis=-1)
    inside_pair = np.all(per_vertex, axis=-1)  # (P,)

    contained = np.zeros(n, dtype=bool)
    np.logical_or.at(contained, ii, inside_pair)
    return quads[~contained]


def remove_area_anomalies(
    quads: np.ndarray,
    sigma_threshold: float = 5.0,
    min_box_count: int = 30,
) -> np.ndarray:
    """Drop quads whose area exceeds mean + sigma_threshold·std; inert when
    the page has ≤ min_box_count boxes (too few for a stable distribution)."""
    if len(quads) == 0 or len(quads) <= min_box_count:
        return quads
    coords = quads[:, :8].reshape(-1, 4, 2)
    areas = polygon_area_batch(coords).astype(np.float32)
    mean = float(np.mean(areas))
    std = float(np.std(areas))
    if std == 0.0:
        return quads
    keep = areas <= mean + sigma_threshold * std
    if not np.any(keep):
        return quads
    return quads[keep]


def quad_to_rbox(quad: np.ndarray) -> np.ndarray:
    """Quad (8 or 9 floats) → rotated box [cx, cy, w, h, angle] via the
    min-area rectangle."""
    try:
        import cv2

        pts = np.asarray(quad, dtype=np.float32).reshape(-1)[:8].reshape(4, 2)
        (cx, cy), (w, h), angle = cv2.minAreaRect(pts)
        return np.array([cx, cy, w, h, angle], dtype=np.float32)
    except ImportError:  # pragma: no cover
        pts = np.asarray(quad, dtype=np.float32).reshape(-1)[:8].reshape(4, 2)
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        return np.array(
            [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0, 0.0], np.float32
        )


def quad_bbox_int(polygon: np.ndarray) -> tuple:
    """Integer axis-aligned bbox (x_min, y_min, x_max, y_max) of a polygon."""
    poly = np.asarray(polygon, dtype=np.int32)
    x_min, y_min = np.min(poly, axis=0)
    x_max, y_max = np.max(poly, axis=0)
    return (int(x_min), int(y_min), int(x_max), int(y_max))
