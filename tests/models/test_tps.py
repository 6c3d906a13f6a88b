"""TPS spatial transformer tests: identity init, grid-sample math, and the
use_tps TRBA integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manuscript_tpu.models.tps import (

    TPSTransformer,
    build_grid_basis,
    canonical_fiducials,
    grid_sample_bilinear,
    tps_system_inverse,
)

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


class TestGridSample:
    def test_identity_grid_reproduces_image(self, rng):
        img = rng.normal(size=(1, 8, 12, 3)).astype(np.float32)
        ys = (np.arange(8) + 0.5) / 8 * 2 - 1
        xs = (np.arange(12) + 0.5) / 12 * 2 - 1
        gx, gy = np.meshgrid(xs, ys)
        grid = np.stack([gx.ravel(), gy.ravel()], axis=1)[None]
        out = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(
            np.asarray(out).reshape(1, 8, 12, 3), img, rtol=1e-5, atol=1e-5
        )

    def test_half_pixel_shift_interpolates(self):
        img = np.zeros((1, 1, 4, 1), np.float32)
        img[0, 0] = np.array([[0], [1], [2], [3]], np.float32)
        # sample halfway between pixels 1 and 2
        x_norm = ((1.5 + 0.5) / 4) * 2 - 1
        grid = np.array([[[x_norm, 0.0]]], np.float32)
        out = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
        assert float(out[0, 0, 0]) == pytest.approx(1.5, abs=1e-5)

    def test_out_of_bounds_clamps(self):
        img = np.ones((1, 4, 4, 1), np.float32) * 7
        grid = np.array([[[-5.0, -5.0], [5.0, 5.0]]], np.float32)
        out = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(np.asarray(out)[..., 0], 7.0)


class TestTPSMath:
    def test_identity_mapping(self):
        # fiducials == canonical frame ⇒ warp is (numerically) the identity
        k = 20
        c = canonical_fiducials(k)
        inv = tps_system_inverse(c)
        basis = build_grid_basis(c, 8, 16)
        rhs = np.concatenate([c, np.zeros((3, 2), np.float32)], axis=0)
        theta = inv @ rhs
        grid = basis @ theta
        ys = (np.arange(8) + 0.5) / 8 * 2 - 1
        xs = (np.arange(16) + 0.5) / 16 * 2 - 1
        gx, gy = np.meshgrid(xs, ys)
        expect = np.stack([gx.ravel(), gy.ravel()], axis=1)
        np.testing.assert_allclose(grid, expect, atol=1e-4)

    def test_fiducial_layout(self):
        c = canonical_fiducials(20)
        assert c.shape == (20, 2)
        assert np.all(c[:10, 1] == -1) and np.all(c[10:, 1] == 1)


class TestTPSModule:
    def test_identity_at_init(self, rng):
        m = TPSTransformer(num_fiducials=20)
        x = jnp.asarray(rng.normal(size=(2, 16, 32, 3)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == x.shape
        # zero-weight localization ⇒ canonical fiducials ⇒ identity warp
        # (≈1e-3 noise from the f32 TPS solve + bilinear resample)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=5e-3)

    def test_trba_with_tps(self, rng):
        from manuscript_tpu.models.trba import TRBAModel

        m = TRBAModel(num_classes=12, hidden_size=16, use_tps=True)
        x = jnp.zeros((1, 32, 64, 3))
        text_in = jnp.zeros((1, 4), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), x, text_in)
        assert "tps" in variables["params"]
        logits = m.apply(variables, x, text_in)
        assert logits.shape == (1, 4, 12)
        _, preds = m.apply(variables, x, max_len=3, method="greedy")
        assert preds.shape == (1, 4)
