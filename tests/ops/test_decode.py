import numpy as np
import pytest

from manuscript_tpu.ops.decode import (
    compact_decoded,
    decode_cells_jax,
    decode_quads_numpy,
)


def _maps(rng, h=64, w=64):
    score = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
    geo = rng.uniform(-4, 4, size=(h, w, 8)).astype(np.float32)
    return score, geo


@pytest.mark.parametrize("quantization", [1, 2, 4])
def test_jax_matches_numpy(rng, quantization):
    score, geo = _maps(rng)
    thresh, scale = 0.8, 4.0

    ref = decode_quads_numpy(score, geo, thresh, scale, quantization)

    quads, scores, valid = decode_cells_jax(
        score, geo, thresh, quantization=quantization, scale=scale
    )
    got = compact_decoded(np.asarray(quads), np.asarray(scores), np.asarray(valid))

    assert got.shape == ref.shape
    # row-major cell order on both sides → direct comparison
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_no_candidates(rng):
    score, geo = _maps(rng)
    quads, scores, valid = decode_cells_jax(score, geo, 2.0, quantization=2)
    got = compact_decoded(np.asarray(quads), np.asarray(scores), np.asarray(valid))
    assert got.shape == (0, 9)
    assert decode_quads_numpy(score, geo, 2.0, 4.0, 2).shape == (0, 9)


def test_decode_geometry_semantics():
    # A single hot pixel with known offsets must decode to exact vertices.
    h = w = 8
    score = np.zeros((h, w), dtype=np.float32)
    geo = np.zeros((h, w, 8), dtype=np.float32)
    score[3, 5] = 0.9
    geo[3, 5] = [-1, -2, 1, -2, 1, 2, -1, 2]
    out = decode_quads_numpy(score, geo, 0.5, scale=4.0, quantization=1)
    assert out.shape == (1, 9)
    expected = [
        (5 - 1) * 4, (3 - 2) * 4,
        (5 + 1) * 4, (3 - 2) * 4,
        (5 + 1) * 4, (3 + 2) * 4,
        (5 - 1) * 4, (3 + 2) * 4,
        0.9,
    ]
    np.testing.assert_allclose(out[0], expected, rtol=1e-6)


def test_quantization_dedup(rng):
    # All pixels above threshold in one 4x4 tile → single candidate at center.
    score = np.zeros((8, 8), dtype=np.float32)
    score[0:4, 0:4] = 0.99
    geo = np.zeros((8, 8, 8), dtype=np.float32)
    out = decode_quads_numpy(score, geo, 0.5, scale=4.0, quantization=4)
    assert out.shape == (1, 9)
    # center pixel (2,2) → all vertices at (8, 8)
    np.testing.assert_allclose(out[0, :8], [8] * 8)


def test_odd_size_padding(rng):
    # Non-divisible map sizes must not crash the device decode.
    score = rng.uniform(0, 1, size=(33, 47)).astype(np.float32)
    geo = rng.uniform(-2, 2, size=(33, 47, 8)).astype(np.float32)
    quads, scores, valid = decode_cells_jax(score, geo, 0.7, quantization=2)
    got = compact_decoded(np.asarray(quads), np.asarray(scores), np.asarray(valid))
    assert got.shape[1] == 9
