"""LANMS numeric parity fixtures.

Ported from the reference's kernel tests (reference:
tests/detectors/east/test_lanms.py:18-188) and extended: every fixture runs
against BOTH the numpy and the native C++ implementation, plus a randomized
cross-check between the two.
"""

import numpy as np
import pytest

from manuscript_tpu.ops.geometry import (
    clip_polygon,
    compute_intersection,
    normalize_polygon,
    polygon_area,
    polygon_intersection,
    polygon_iou,
    should_merge,
)
from manuscript_tpu.ops.lanms import (
    locality_aware_nms_native,
    locality_aware_nms_numpy,
    native_available,
    standard_nms,
)

LANMS_IMPLS = [locality_aware_nms_numpy]
if native_available():
    LANMS_IMPLS.append(locality_aware_nms_native)


def test_polygon_area_square():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    np.testing.assert_allclose(polygon_area(poly), 1.0, rtol=1e-5)


def test_polygon_area_triangle():
    poly = np.array([[0, 0], [2, 0], [0, 2]], dtype=np.float64)
    np.testing.assert_allclose(polygon_area(poly), 2.0, rtol=1e-5)


def test_polygon_area_degenerate():
    poly = np.array([[0, 0], [1, 0]], dtype=np.float64)
    assert polygon_area(poly) == pytest.approx(0.0)


def test_compute_intersection():
    p1 = np.array([0, 0], dtype=np.float64)
    p2 = np.array([2, 2], dtype=np.float64)
    a = np.array([0, 2], dtype=np.float64)
    b = np.array([2, 0], dtype=np.float64)
    np.testing.assert_allclose(
        compute_intersection(p1, p2, a, b), np.array([1.0, 1.0]), rtol=1e-5
    )


def test_compute_intersection_parallel():
    p1 = np.array([0, 0], dtype=np.float64)
    p2 = np.array([1, 1], dtype=np.float64)
    a = np.array([2, 2], dtype=np.float64)
    b = np.array([3, 3], dtype=np.float64)
    np.testing.assert_allclose(compute_intersection(p1, p2, a, b), p1, rtol=1e-5)


def test_clip_polygon():
    subject = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    a = np.array([2, 5], dtype=np.float64)
    b = np.array([2, -1], dtype=np.float64)
    clipped, count = clip_polygon(subject, a, b)
    expected = np.array([[2, 0], [4, 0], [4, 4], [2, 4]], dtype=np.float64)
    np.testing.assert_allclose(clipped, expected, rtol=1e-5)
    assert count == 4


def test_clip_polygon_no_clip():
    subject = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    a = np.array([100, 0], dtype=np.float64)
    b = np.array([100, 1], dtype=np.float64)
    clipped, count = clip_polygon(subject, a, b)
    np.testing.assert_allclose(clipped, subject, rtol=1e-5)
    assert count == subject.shape[0]


def test_clip_polygon_full_clip():
    subject = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], dtype=np.float64)
    a = np.array([0, 0], dtype=np.float64)
    b = np.array([0, 1], dtype=np.float64)
    clipped, count = clip_polygon(subject, a, b)
    assert clipped.shape == (0, 2)
    assert count == 0


def test_polygon_intersection():
    poly1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=np.float64)
    inter = polygon_intersection(poly1, poly2)
    expected = np.array([[2, 2], [4, 2], [4, 4], [2, 4]], dtype=np.float64)
    np.testing.assert_allclose(inter, expected, rtol=1e-5)


def test_polygon_intersection_no_overlap():
    poly1 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    poly2 = np.array([[2, 2], [3, 2], [3, 3], [2, 3]], dtype=np.float64)
    assert polygon_intersection(poly1, poly2).shape == (0, 2)


def test_polygon_iou():
    poly1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=np.float64)
    assert np.isclose(polygon_iou(poly1, poly2), 4 / 28, rtol=1e-5)


def test_polygon_iou_extremes():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    assert polygon_iou(poly, poly) == pytest.approx(1.0)
    other = np.array([[2, 2], [3, 2], [3, 3], [2, 3]], dtype=np.float64)
    assert polygon_iou(poly, other) == pytest.approx(0.0)


def test_should_merge():
    poly1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=np.float64)
    assert should_merge(poly1, poly2, 0.1)
    assert not should_merge(poly1, poly2, 0.2)


def test_should_merge_at_threshold():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    assert not should_merge(poly, poly, 1.0)
    assert should_merge(poly, poly, 0.999)


def test_normalize_polygon():
    ref = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly = np.array([[4, 4], [0, 4], [0, 0], [4, 0]], dtype=np.float64)
    np.testing.assert_allclose(normalize_polygon(ref, poly), ref, rtol=1e-5)


def test_normalize_polygon_variants():
    ref = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    for start in range(4):
        fwd = np.vstack([ref[(i + start) % 4] for i in range(4)])
        rev = np.vstack([ref[(start - i) % 4] for i in range(4)])
        for var in (fwd, rev):
            np.testing.assert_allclose(normalize_polygon(ref, var), ref, rtol=1e-5)


def test_standard_nms():
    polys = [
        np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64),
        np.array([[1, 1], [5, 1], [5, 5], [1, 5]], dtype=np.float64),
        np.array([[10, 10], [14, 10], [14, 14], [10, 14]], dtype=np.float64),
    ]
    scores = [0.9, 0.8, 0.7]
    kept_polys, kept_scores = standard_nms(polys, scores, 0.1)
    assert len(kept_polys) == 2
    assert kept_scores[0] == pytest.approx(0.9)


@pytest.mark.parametrize("lanms", LANMS_IMPLS)
def test_locality_aware_nms(lanms):
    boxes = np.array(
        [
            [0, 0, 4, 0, 4, 4, 0, 4, 0.9],
            [1, 1, 5, 1, 5, 5, 1, 5, 0.8],
            [10, 10, 14, 10, 14, 14, 10, 14, 0.7],
            [11, 11, 15, 11, 15, 15, 11, 15, 0.6],
        ],
        dtype=np.float32,
    )
    final = lanms(boxes, 0.1)
    assert final.shape[0] == 2


@pytest.mark.parametrize("lanms", LANMS_IMPLS)
def test_locality_aware_nms_empty(lanms):
    out = lanms(np.zeros((0, 9), dtype=np.float32), 0.5)
    assert out.shape == (0, 9)


@pytest.mark.parametrize("lanms", LANMS_IMPLS)
def test_lanms_merge_weighting(lanms):
    # Two heavily-overlapping unit squares: merged vertices are the
    # score-weighted average, score is the max.
    boxes = np.array(
        [
            [0, 0, 4, 0, 4, 4, 0, 4, 0.6],
            [0.4, 0.4, 4.4, 0.4, 4.4, 4.4, 0.4, 4.4, 0.2],
        ],
        dtype=np.float64,
    )
    out = lanms(boxes, 0.3)
    assert out.shape[0] == 1
    expected_x0 = (0 * 0.6 + 0.4 * 0.2) / 0.8
    np.testing.assert_allclose(out[0, 0], expected_x0, rtol=1e-5)
    assert out[0, 8] == pytest.approx(0.6, rel=1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_matches_numpy_random(rng):
    # Random clusters of overlapping quads: C++ and numpy must agree exactly.
    for trial in range(5):
        n = 40
        centers = rng.uniform(0, 200, size=(n, 2))
        w = rng.uniform(5, 30, size=(n, 1))
        h = rng.uniform(5, 15, size=(n, 1))
        x0, y0 = centers[:, :1] - w / 2, centers[:, 1:] - h / 2
        x1, y1 = centers[:, :1] + w / 2, centers[:, 1:] + h / 2
        quads = np.concatenate([x0, y0, x1, y0, x1, y1, x0, y1], axis=1)
        scores = rng.uniform(0.5, 1.0, size=(n, 1))
        boxes = np.concatenate([quads, scores], axis=1).astype(np.float32)
        a = locality_aware_nms_numpy(boxes, 0.2)
        b = locality_aware_nms_native(boxes, 0.2)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
