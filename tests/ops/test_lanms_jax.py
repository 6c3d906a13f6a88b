"""Device LANMS parity vs the host (numpy) implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from manuscript_tpu.ops.lanms import locality_aware_nms_numpy
from manuscript_tpu.ops.lanms_jax import (
    locality_aware_nms_jax,
    locality_aware_nms_parallel,
    quad_iou_matrix,
    quad_iou_pairs,
)
from manuscript_tpu.ops.geometry import polygon_iou

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


def _quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


class TestQuadIoU:
    def test_known_overlap(self):
        a = _quad(0, 0, 4, 4)
        b = _quad(2, 2, 6, 6)
        iou = quad_iou_pairs(jnp.asarray(a[None]), jnp.asarray(b[None]))
        np.testing.assert_allclose(float(iou[0]), 4 / 28, rtol=1e-5)

    def test_identical_and_disjoint(self):
        a = _quad(0, 0, 1, 1)
        c = _quad(2, 2, 3, 3)
        pairs = quad_iou_pairs(
            jnp.asarray(np.stack([a, a])), jnp.asarray(np.stack([a, c]))
        )
        np.testing.assert_allclose(np.asarray(pairs), [1.0, 0.0], atol=1e-6)

    def test_matrix_matches_host_random(self, rng):
        n = 12
        quads = []
        for _ in range(n):
            cx, cy = rng.uniform(0, 50, 2)
            w, h = rng.uniform(3, 15, 2)
            ang = rng.uniform(0, np.pi)
            c, s = np.cos(ang), np.sin(ang)
            base = np.array(
                [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
            )
            rot = base @ np.array([[c, -s], [s, c]]) + [cx, cy]
            quads.append(rot.astype(np.float32))
        quads = np.stack(quads)
        got = np.asarray(quad_iou_matrix(jnp.asarray(quads), jnp.asarray(quads)))
        for i in range(n):
            for j in range(n):
                ref = polygon_iou(quads[i].astype(np.float64), quads[j])
                assert got[i, j] == pytest.approx(ref, abs=2e-4), (i, j)


class TestDeviceLANMS:
    def _run(self, boxes, thresh, max_out=64):
        k = max(len(boxes), 1)
        cands = np.full((max(k, 8), 9), -1.0, np.float32)
        if len(boxes):
            cands[: len(boxes)] = boxes
        out, n = locality_aware_nms_jax(
            jnp.asarray(cands), jnp.float32(thresh), max_out=max_out
        )
        return np.asarray(out)[: int(n)]

    def test_reference_fixture(self):
        boxes = np.array(
            [
                [0, 0, 4, 0, 4, 4, 0, 4, 0.9],
                [1, 1, 5, 1, 5, 5, 1, 5, 0.8],
                [10, 10, 14, 10, 14, 14, 10, 14, 0.7],
                [11, 11, 15, 11, 15, 15, 11, 15, 0.6],
            ],
            np.float32,
        )
        got = self._run(boxes, 0.1)
        ref = locality_aware_nms_numpy(boxes, 0.1)
        assert got.shape[0] == ref.shape[0] == 2
        # same quads modulo ordering by score (both score-desc)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)

    def test_empty(self):
        got = self._run(np.zeros((0, 9), np.float32), 0.5)
        assert got.shape[0] == 0

    def test_single_box(self):
        boxes = np.array([[0, 0, 4, 0, 4, 4, 0, 4, 0.5]], np.float32)
        got = self._run(boxes, 0.2)
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], boxes[0], rtol=1e-5)

    def test_merge_weighting_matches_host(self):
        boxes = np.array(
            [
                [0, 0, 4, 0, 4, 4, 0, 4, 0.6],
                [0.4, 0.4, 4.4, 0.4, 4.4, 4.4, 0.4, 4.4, 0.2],
            ],
            np.float32,
        )
        got = self._run(boxes, 0.3)
        ref = locality_aware_nms_numpy(boxes, 0.3)
        assert got.shape[0] == 1
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("trial", range(3))
    def test_random_clusters_match_host(self, rng, trial):
        n = 30
        centers = rng.uniform(0, 150, size=(n, 2))
        w = rng.uniform(5, 25, size=(n, 1))
        h = rng.uniform(5, 12, size=(n, 1))
        x0, y0 = centers[:, :1] - w / 2, centers[:, 1:] - h / 2
        x1, y1 = centers[:, :1] + w / 2, centers[:, 1:] + h / 2
        quads = np.concatenate([x0, y0, x1, y0, x1, y1, x0, y1], axis=1)
        scores = rng.uniform(0.5, 1.0, size=(n, 1))
        boxes = np.concatenate([quads, scores], axis=1).astype(np.float32)

        got = self._run(boxes, 0.2, max_out=64)
        ref = locality_aware_nms_numpy(boxes, 0.2)
        assert got.shape[0] == ref.shape[0]
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)

    def test_padding_rows_ignored(self):
        cands = np.full((16, 9), -1.0, np.float32)
        cands[3] = [0, 0, 4, 0, 4, 4, 0, 4, 0.9]
        cands[7] = [10, 0, 14, 0, 14, 4, 10, 4, 0.8]
        out, n = locality_aware_nms_jax(jnp.asarray(cands), jnp.float32(0.2), max_out=8)
        assert int(n) == 2


class TestParallelLANMS:
    """The fused-path kernel: segmented merge + fixpoint greedy NMS.

    Exactness caveat (see lanms_jax docstring): the chain test uses the
    previous candidate instead of the running average, so fixtures use
    clusters whose members mutually overlap — there both impls agree with
    the host."""

    def _run(self, boxes, thresh, max_out=64):
        k = max(len(boxes), 8)
        cands = np.full((k, 9), -1.0, np.float32)
        if len(boxes):
            cands[: len(boxes)] = boxes
        out, n = locality_aware_nms_parallel(
            jnp.asarray(cands), jnp.float32(thresh), max_out=max_out
        )
        return np.asarray(out)[: int(n)]

    def test_reference_fixture(self):
        boxes = np.array(
            [
                [0, 0, 4, 0, 4, 4, 0, 4, 0.9],
                [1, 1, 5, 1, 5, 5, 1, 5, 0.8],
                [10, 10, 14, 10, 14, 14, 10, 14, 0.7],
                [11, 11, 15, 11, 15, 15, 11, 15, 0.6],
            ],
            np.float32,
        )
        got = self._run(boxes, 0.1)
        ref = locality_aware_nms_numpy(boxes, 0.1)
        assert got.shape[0] == ref.shape[0] == 2
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)

    def test_empty_and_single(self):
        assert self._run(np.zeros((0, 9), np.float32), 0.5).shape[0] == 0
        boxes = np.array([[0, 0, 4, 0, 4, 4, 0, 4, 0.5]], np.float32)
        got = self._run(boxes, 0.2)
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], boxes[0], rtol=1e-5)

    def test_merge_weighting_matches_host(self):
        boxes = np.array(
            [
                [0, 0, 4, 0, 4, 4, 0, 4, 0.6],
                [0.4, 0.4, 4.4, 0.4, 4.4, 4.4, 0.4, 4.4, 0.2],
            ],
            np.float32,
        )
        got = self._run(boxes, 0.3)
        ref = locality_aware_nms_numpy(boxes, 0.3)
        assert got.shape[0] == 1
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("trial", range(3))
    def test_random_tight_clusters_match_host(self, rng, trial):
        """Clusters of near-duplicate quads (the EAST decode regime): every
        member overlaps every other, so prev-vs-running merge agree."""
        n_clusters, per = 6, 5
        rows = []
        for _ in range(n_clusters):
            cx, cy = rng.uniform(0, 400, 2)
            w, h = rng.uniform(30, 60), rng.uniform(12, 20)
            for _ in range(per):
                jx, jy = rng.uniform(-1.5, 1.5, 2)
                x0, y0 = cx + jx, cy + jy
                rows.append(
                    [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h,
                     rng.uniform(0.5, 1.0)]
                )
        boxes = np.asarray(rows, np.float32)
        got = self._run(boxes, 0.2, max_out=64)
        ref = locality_aware_nms_numpy(boxes, 0.2)
        assert got.shape[0] == ref.shape[0]
        # order-insensitive compare: match rows by nearest centroid
        got_c = got[:, :8].reshape(-1, 4, 2).mean(axis=1)
        ref_c = ref[:, :8].reshape(-1, 4, 2).mean(axis=1)
        for g, gc in zip(got, got_c):
            j = int(np.argmin(np.linalg.norm(ref_c - gc, axis=1)))
            np.testing.assert_allclose(g, ref[j], rtol=1e-3, atol=5e-2)

    def test_greedy_fixpoint_suppression_chain(self):
        """A kills B; B would kill C but is dead → C survives. Exact greedy
        (a one-shot matrix suppression would wrongly drop C). Spacer boxes
        X, Y sit between them in x-order but far away in y, so the LANMS
        merge stage (which shares the threshold) never chains A, B, C."""

        def row(x0, y0, w, h, s):
            return [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h, s]

        boxes = np.array(
            [
                row(0, 0, 10, 10, 0.9),   # A
                row(5, 100, 4, 4, 0.3),   # X spacer
                row(6, 0, 10, 10, 0.8),   # B: IoU(A,B)=40/160=0.25
                row(8, 200, 4, 4, 0.3),   # Y spacer
                row(12, 0, 10, 10, 0.7),  # C: IoU(B,C)=0.25, IoU(A,C)=0
            ],
            np.float32,
        )
        got = self._run(boxes, 0.2)
        assert got.shape[0] == 4  # A, C, X, Y — B suppressed by A
        xs = sorted(round(float(g[0]), 3) for g in got)
        assert 6.0 not in xs and 12.0 in xs and 0.0 in xs

        # host reference agrees
        ref = locality_aware_nms_numpy(boxes, 0.2)
        assert ref.shape[0] == 4
