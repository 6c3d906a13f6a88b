import numpy as np
import pytest

from manuscript_tpu.ops.boxes import (
    expand_boxes,
    quad_bbox_int,
    remove_area_anomalies,
    remove_fully_contained,
    scale_boxes,
    to_axis_aligned,
)
from manuscript_tpu.ops.reading_order import (
    reading_order_permutation,
    resolve_intersections,
    sort_boxes_reading_order,
    sort_boxes_reading_order_with_resolutions,
)


def _quad(x0, y0, x1, y1, score=0.9):
    return [x0, y0, x1, y0, x1, y1, x0, y1, score]


class TestBoxes:
    def test_expand_noop(self):
        q = np.array([_quad(0, 0, 4, 4)], dtype=np.float32)
        out = expand_boxes(q, 0.0, 0.0)
        np.testing.assert_array_equal(out, q)

    def test_expand_grows_square(self):
        q = np.array([_quad(10, 10, 20, 20)], dtype=np.float32)
        out = expand_boxes(q, 0.5, 0.5)
        coords = out[0, :8].reshape(4, 2)
        orig = q[0, :8].reshape(4, 2)
        # every vertex moves outward from the centroid
        c = orig.mean(axis=0)
        d_orig = np.linalg.norm(orig - c, axis=1)
        d_new = np.linalg.norm(coords - c, axis=1)
        assert np.all(d_new > d_orig)
        # score untouched
        assert out[0, 8] == pytest.approx(0.9)

    def test_scale_boxes(self):
        q = np.array([_quad(0, 0, 640, 640)], dtype=np.float32)
        out = scale_boxes(q, from_size=1280, orig_h=2560, orig_w=640)
        assert out[0, 2] == pytest.approx(320)  # x scaled by 0.5
        assert out[0, 5] == pytest.approx(1280)  # y scaled by 2

    def test_to_axis_aligned(self):
        rot = np.array([[2, 0, 4, 2, 2, 4, 0, 2, 0.8]], dtype=np.float32)
        out = to_axis_aligned(rot)
        np.testing.assert_allclose(out[0, :8], [0, 0, 4, 0, 4, 4, 0, 4])

    def test_remove_fully_contained(self):
        outer = _quad(0, 0, 10, 10)
        inner = _quad(2, 2, 5, 5)
        separate = _quad(20, 20, 30, 30)
        quads = np.array([outer, inner, separate], dtype=np.float32)
        out = remove_fully_contained(quads)
        assert out.shape[0] == 2
        np.testing.assert_allclose(out[0], outer, rtol=1e-6)

    def test_remove_area_anomalies(self):
        quads = [_quad(i * 12, 0, i * 12 + 10, 10) for i in range(40)]
        quads.append(_quad(0, 100, 1000, 1100))  # giant outlier
        arr = np.array(quads, dtype=np.float32)
        out = remove_area_anomalies(arr, sigma_threshold=5.0, min_box_count=30)
        assert out.shape[0] == 40

    def test_area_anomalies_inert_below_min_count(self):
        quads = np.array(
            [_quad(0, 0, 10, 10), _quad(0, 100, 1000, 1100)], dtype=np.float32
        )
        out = remove_area_anomalies(quads, min_box_count=30)
        assert out.shape[0] == 2

    def test_quad_bbox_int(self):
        poly = np.array([[1.2, 2.7], [5.9, 2.1], [5.5, 8.8], [1.1, 8.2]])
        assert quad_bbox_int(poly.astype(np.int32)) == (1, 2, 5, 8)


class TestReadingOrder:
    def test_simple_two_lines(self):
        boxes = [(10, 50, 50, 70), (60, 10, 100, 30), (10, 10, 50, 30)]
        out = sort_boxes_reading_order(boxes)
        assert out == [(10, 10, 50, 30), (60, 10, 100, 30), (10, 50, 50, 70)]

    def test_empty(self):
        assert sort_boxes_reading_order([]) == []
        assert sort_boxes_reading_order_with_resolutions([]) == []
        assert reading_order_permutation([]) == []

    def test_resolve_intersections_disjoint_untouched(self):
        boxes = [(0, 0, 10, 10), (20, 20, 30, 30)]
        assert resolve_intersections(boxes) == boxes

    def test_resolve_intersections_shrinks(self):
        boxes = [(0, 0, 12, 10), (10, 0, 22, 10)]
        out = resolve_intersections(boxes)
        assert out[0][2] < 12 or out[1][2] < 22

    def test_with_resolutions_returns_originals(self):
        boxes = [(50, 10, 100, 30), (10, 10, 55, 30)]  # overlapping, same line
        out = sort_boxes_reading_order_with_resolutions(boxes)
        assert sorted(out) == sorted(boxes)
        assert out[0] == (10, 10, 55, 30)

    def test_permutation_matches_sort(self):
        boxes = [(60, 10, 100, 30), (10, 50, 50, 70), (10, 10, 50, 30)]
        perm = reading_order_permutation(boxes)
        sorted_boxes = sort_boxes_reading_order_with_resolutions(boxes)
        assert [boxes[i] for i in perm] == sorted_boxes

    def test_permutation_handles_duplicates(self):
        boxes = [(0, 0, 10, 10), (0, 0, 10, 10), (20, 0, 30, 10)]
        perm = reading_order_permutation(boxes)
        assert sorted(perm) == [0, 1, 2]
