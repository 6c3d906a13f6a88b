"""Pallas tiled quad-IoU kernel parity (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from manuscript_tpu.ops.lanms_jax import quad_iou_matrix
from manuscript_tpu.ops.pallas_iou import pallas_quad_iou_matrix

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


def _rot_quads(rng, n, span=60.0):
    out = []
    for _ in range(n):
        cx, cy = rng.uniform(0, span, 2)
        w, h = rng.uniform(3, 15, 2)
        ang = rng.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        base = np.array(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        )
        out.append(base @ np.array([[c, -s], [s, c]]) + [cx, cy])
    return np.stack(out).astype(np.float32)


def test_matches_xla_rotated(rng):
    q = jnp.asarray(_rot_quads(rng, 64))
    got = np.asarray(pallas_quad_iou_matrix(q, q, tm=32, tn=32, interpret=True))
    ref = np.asarray(quad_iou_matrix(q, q))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_rectangular_grid(rng):
    a = jnp.asarray(_rot_quads(rng, 32))
    b = jnp.asarray(_rot_quads(rng, 64))
    got = np.asarray(pallas_quad_iou_matrix(a, b, tm=32, tn=32, interpret=True))
    ref = np.asarray(quad_iou_matrix(a, b))
    assert got.shape == (32, 64)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_diagonal_is_one(rng):
    # rotated quads: vertices sit exactly ON their own clip edges, so f32
    # side-sign noise nibbles a sliver off the self-intersection
    q = jnp.asarray(_rot_quads(rng, 32))
    got = np.asarray(pallas_quad_iou_matrix(q, q, tm=32, tn=32, interpret=True))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=5e-3)


def test_tile_size_must_divide(rng):
    q = jnp.asarray(_rot_quads(rng, 48))
    with pytest.raises(AssertionError):
        pallas_quad_iou_matrix(q, q, tm=32, tn=32, interpret=True)
