"""TPS spatial transformer (optional input rectification for TRBA).

The reference's "TRBA" name promises a TPS transform but ships none
(reference: src/manuscript/recognizers/_trba/model/model.py — no TPS module;
SURVEY.md §2.3). This module provides the real thing, off by default for
checkpoint parity: a localization CNN predicts K fiducial points, a thin-
plate-spline maps a canonical fiducial frame onto them, and the input is
bilinearly resampled on the warped grid — all as fixed-shape tensor ops
(the TPS system matrix is precomputed and inverted at trace time; sampling
is a vectorized gather).

Fiducial layout and identity initialization follow the standard RARE/ASTER
construction: K/2 points along the top edge, K/2 along the bottom, bias of
the final localization layer set to the canonical frame so training starts
from the identity warp.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def canonical_fiducials(k: int) -> np.ndarray:
    """K fiducial points in [-1, 1]²: K/2 on the top edge, K/2 on bottom."""
    half = k // 2
    x = np.linspace(-1.0, 1.0, half)
    top = np.stack([x, -np.ones(half)], axis=1)
    bottom = np.stack([x, np.ones(half)], axis=1)
    return np.concatenate([top, bottom], axis=0).astype(np.float32)


def _tps_u(r2: jnp.ndarray) -> jnp.ndarray:
    """TPS radial basis U(r) = r² log r² (0 at r = 0)."""
    return jnp.where(r2 == 0, 0.0, r2 * jnp.log(jnp.maximum(r2, 1e-12)))


def tps_system_inverse(c: np.ndarray) -> np.ndarray:
    """Inverse of the (K+3, K+3) TPS system matrix for base fiducials C."""
    k = c.shape[0]
    d2 = np.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.where(d2 == 0, 0.0, d2 * np.log(np.maximum(d2, 1e-12)))
    mat = np.zeros((k + 3, k + 3), dtype=np.float64)
    mat[:k, :k] = u
    mat[:k, k] = 1.0
    mat[:k, k + 1 :] = c
    mat[k, :k] = 1.0
    mat[k + 1 :, :k] = c.T
    return np.linalg.inv(mat).astype(np.float32)


def build_grid_basis(
    c: np.ndarray, out_h: int, out_w: int
) -> np.ndarray:
    """(H·W, K+3) basis [U(P, C), 1, P] evaluated at the output grid."""
    ys = (np.arange(out_h) + 0.5) / out_h * 2 - 1
    xs = (np.arange(out_w) + 0.5) / out_w * 2 - 1
    gx, gy = np.meshgrid(xs, ys)
    p = np.stack([gx.ravel(), gy.ravel()], axis=1)  # (N, 2)
    d2 = np.sum((p[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.where(d2 == 0, 0.0, d2 * np.log(np.maximum(d2, 1e-12)))
    ones = np.ones((p.shape[0], 1))
    return np.concatenate([u, ones, p], axis=1).astype(np.float32)  # (N, K+3)


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of NHWC images at normalized [-1, 1] coordinates.

    grid: (B, N, 2) (x, y) normalized, half-pixel-center convention
    (align_corners=False); border padding via clamping.
    """
    b, h, w, c = img.shape
    # border padding: clamp the continuous coordinate BEFORE flooring so the
    # interpolation weight stays consistent with the clamped cell
    x = jnp.clip((grid[..., 0] + 1.0) * (w / 2.0) - 0.5, 0.0, w - 1.0)
    y = jnp.clip((grid[..., 1] + 1.0) * (h / 2.0) - 0.5, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    def gather(yy, xx):  # (B, N) indices → (B, N, C)
        batch = jnp.arange(b)[:, None]
        return img[batch, yy, xx]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class LocalizationNetwork(nn.Module):
    """Small conv net predicting K fiducial points, identity-initialized."""

    num_fiducials: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for ch in (64, 128, 256, 512):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.relu(nn.Dense(256, dtype=self.dtype)(x))
        # identity init: zero weights, bias = canonical frame
        c0 = canonical_fiducials(self.num_fiducials).ravel()
        fid = nn.Dense(
            2 * self.num_fiducials,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(c0),
            dtype=self.dtype,
        )(x)
        return fid.reshape(-1, self.num_fiducials, 2)


class TPSTransformer(nn.Module):
    """Full TPS rectification: localize fiducials → warp grid → resample."""

    num_fiducials: int = 20
    out_h: int = 0  # 0 → same as input
    out_w: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        out_h = self.out_h or x.shape[1]
        out_w = self.out_w or x.shape[2]
        fiducials = LocalizationNetwork(
            self.num_fiducials, dtype=self.dtype, name="localization"
        )(x, train=train)  # (B, K, 2)

        c = canonical_fiducials(self.num_fiducials)
        inv = jnp.asarray(tps_system_inverse(c))  # (K+3, K+3)
        basis = jnp.asarray(build_grid_basis(c, out_h, out_w))  # (N, K+3)

        rhs = jnp.concatenate(
            [fiducials, jnp.zeros((b, 3, 2), fiducials.dtype)], axis=1
        )  # (B, K+3, 2)
        theta = jnp.einsum("ij,bjc->bic", inv, rhs)  # (B, K+3, 2)
        grid = jnp.einsum("nj,bjc->bnc", basis, theta)  # (B, N, 2)

        sampled = grid_sample_bilinear(x.astype(jnp.float32), grid)
        return sampled.reshape(b, out_h, out_w, x.shape[-1]).astype(self.dtype)
