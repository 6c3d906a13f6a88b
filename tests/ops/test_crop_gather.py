"""Device crop-gather parity vs the host crop + resize_and_pad path."""

import numpy as np
import pytest

import jax.numpy as jnp

from manuscript_tpu.ops.crop_gather import crop_resize_pad, crop_resize_pad_mm
from manuscript_tpu.ops.image import crop_axis_aligned, resize_and_pad

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


@pytest.fixture(params=["gather", "matmul"])
def crop_fn(request):
    """Both device formulations share semantics; the matmul one is the
    fused-pipeline hot path (MXU), the gather one the readable spec."""
    return {"gather": crop_resize_pad, "matmul": crop_resize_pad_mm}[
        request.param
    ]


def _host_crop(img, box, out_h, out_w):
    x1, y1, x2, y2 = box
    poly = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.int32)
    region = crop_axis_aligned(img, poly)
    return resize_and_pad(region, out_h, out_w)


def _pad_mask(img, box, out_h, out_w):
    """Geometric white-pad region for a clamped box (True = padding)."""
    h, w = img.shape[:2]
    x1, y1 = max(0, int(box[0])), max(0, int(box[1]))
    x2, y2 = min(w, int(box[2])), min(h, int(box[3]))
    cw, ch = max(x2 - x1, 1), max(y2 - y1, 1)
    scale = min(out_h / ch, out_w / cw)
    new_w, new_h = max(1, round(cw * scale)), max(1, round(ch * scale))
    y0 = (out_h - new_h) // 2
    mask = np.ones((out_h, out_w), bool)
    mask[y0 : y0 + new_h, :new_w] = False
    return mask


def _assert_close(img, box, got, ref, mean_tol, q99_tol=None):
    pad = _pad_mask(img, box, got.shape[0], got.shape[1])
    assert (got[pad] == 255).all()
    assert (ref[pad] == 255).all()
    diff = np.abs(got[~pad].astype(int) - ref[~pad].astype(int))
    assert diff.mean() < mean_tol
    if q99_tol is not None:
        assert np.quantile(diff, 0.99) <= q99_tol


@pytest.fixture
def img(rng):
    # smooth image: bilinear (device) vs cv2 INTER_LINEAR (host) agree to
    # rounding on smooth content; hard random noise would amplify the
    # fixed-point vs float interpolator difference
    base = rng.integers(0, 255, size=(20, 24, 3)).astype(np.uint8)
    import cv2

    return cv2.resize(base, (240, 200), interpolation=cv2.INTER_CUBIC)


class TestCropResizePad:
    def test_upscale_crop_matches_host(self, img, crop_fn):
        boxes = np.array([[10.0, 20.0, 90.0, 44.0]], np.float32)  # 80×24 → ↑
        got = np.asarray(
            crop_fn(
                jnp.asarray(img), jnp.asarray(boxes), jnp.ones((1,), bool),
                out_h=64, out_w=256,
            )
        )[0]
        ref = _host_crop(img, (10, 20, 90, 44), 64, 256)
        assert got.shape == ref.shape
        # cv2 INTER_LINEAR runs fixed-point (8-bit fractions); q99 absorbs
        # the worst sharp-edge rounding deltas
        _assert_close(img, (10, 20, 90, 44), got, ref, mean_tol=1.5, q99_tol=8)

    def test_geometry_left_aligned_v_centered(self, img, crop_fn):
        boxes = np.array([[0.0, 0.0, 100.0, 20.0]], np.float32)  # 5:1 w:h
        got = np.asarray(
            crop_fn(
                jnp.asarray(img), jnp.asarray(boxes), jnp.ones((1,), bool),
                out_h=64, out_w=256,
            )
        )[0]
        ref = _host_crop(img, (0, 0, 100, 20), 64, 256)
        # scaled content: scale = min(64/20, 256/100) = 2.56 → 256×51
        _assert_close(img, (0, 0, 100, 20), got, ref, mean_tol=2.0)

    def test_invalid_rows_white(self, img, crop_fn):
        boxes = np.array(
            [[10.0, 10.0, 50.0, 30.0], [10.0, 10.0, 50.0, 30.0]], np.float32
        )
        got = np.asarray(
            crop_fn(
                jnp.asarray(img),
                jnp.asarray(boxes),
                jnp.asarray([True, False]),
                out_h=32, out_w=128,
            )
        )
        assert (got[1] == 255).all()
        assert not (got[0] == 255).all()

    def test_out_of_bounds_clamped(self, img, crop_fn):
        h, w = img.shape[:2]
        boxes = np.array([[-20.0, -10.0, w + 30.0, h + 5.0]], np.float32)
        got = np.asarray(
            crop_fn(
                jnp.asarray(img), jnp.asarray(boxes), jnp.ones((1,), bool),
                out_h=64, out_w=256,
            )
        )[0]
        ref = _host_crop(img, (-20, -10, w + 30, h + 5), 64, 256)
        _assert_close(img, (-20, -10, w + 30, h + 5), got, ref, mean_tol=4.0)

    def test_downscale_close_to_host(self, img, crop_fn):
        # big crop shrunk: host uses INTER_AREA, device bilinear — looser
        boxes = np.array([[0.0, 0.0, 240.0, 100.0]], np.float32)
        got = np.asarray(
            crop_fn(
                jnp.asarray(img), jnp.asarray(boxes), jnp.ones((1,), bool),
                out_h=64, out_w=256,
            )
        )[0]
        ref = _host_crop(img, (0, 0, 240, 100), 64, 256)
        _assert_close(img, (0, 0, 240, 100), got, ref, mean_tol=12.0)


class TestMatmulGatherEquivalence:
    def test_formulations_agree(self, rng):
        """The MXU matmul formulation is the same separable bilinear sample
        as the gather formulation — agree to ±2 uint8 (f32 rounding at the
        0.5-ulp round boundary)."""
        img = jnp.asarray(rng.integers(0, 255, (200, 240, 3)).astype(np.uint8))
        boxes = np.zeros((16, 4), np.float32)
        boxes[:, 0] = rng.uniform(-10, 200, 16)
        boxes[:, 1] = rng.uniform(-10, 160, 16)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(4, 120, 16)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(4, 60, 16)
        valid = jnp.asarray(rng.random(16) > 0.2)
        a = np.asarray(
            crop_resize_pad(img, jnp.asarray(boxes), valid, 64, 256)
        ).astype(int)
        b = np.asarray(
            crop_resize_pad_mm(img, jnp.asarray(boxes), valid, 64, 256)
        ).astype(int)
        diff = np.abs(a - b)
        assert diff.max() <= 2
        assert (diff > 0).mean() < 0.02


class TestAspectCorrection:
    def test_nonsquare_page_crop_keeps_original_aspect(self, crop_fn, rng):
        """Crops sampled from the SQUARE detector copy of a non-square page
        must match the host path's crop from the ORIGINAL page (the classic
        Pipeline crops full-res, _pipeline.py:204-221). Without the aspect
        argument every word is stretched by the page's W/H ratio — the bug
        the trained-weights quality gate caught (fused CER 0.38 vs host
        0.075 on identical boxes, BASELINE.md r4 quality section)."""
        import cv2

        # non-square "page" with smooth content, like a 4:3 manuscript scan
        base = rng.integers(0, 255, (15, 10, 3)).astype(np.uint8)
        page = cv2.resize(base, (360, 480), interpolation=cv2.INTER_CUBIC)
        t = 240  # square detector copy
        small = cv2.resize(page, (t, t), interpolation=cv2.INTER_LINEAR)
        sx, sy = page.shape[1] / t, page.shape[0] / t  # 1.5, 2.0

        # a wide word-shaped box in original coords
        ox1, oy1, ox2, oy2 = 40, 100, 200, 148
        det_box = np.array(
            [[ox1 / sx, oy1 / sy, ox2 / sx, oy2 / sy]], np.float32
        )
        got = np.asarray(
            crop_fn(
                jnp.asarray(small), jnp.asarray(det_box),
                jnp.ones((1,), bool), out_h=32, out_w=128,
                aspect=(jnp.float32(sx), jnp.float32(sy)),
            )
        )[0]
        ref = _host_crop(page, (ox1, oy1, ox2, oy2), 32, 128)

        # canvas geometry must match the host exactly: same non-pad region
        got_pad = got.mean(axis=2) == 255.0
        ref_pad = ref.mean(axis=2) == 255.0
        assert (got_pad == ref_pad).mean() > 0.98
        # content agrees despite the 2x-downsampled source (loose tol)
        diff = np.abs(
            got[~ref_pad].astype(int) - ref[~ref_pad].astype(int)
        )
        assert diff.mean() < 20.0

    def test_aspect_default_is_identity(self, rng):
        img = jnp.asarray(rng.integers(0, 255, (100, 100, 3)).astype(np.uint8))
        boxes = jnp.asarray(np.array([[10, 20, 80, 50]], np.float32))
        valid = jnp.ones((1,), bool)
        a = np.asarray(crop_resize_pad_mm(img, boxes, valid, 32, 128))
        b = np.asarray(
            crop_resize_pad_mm(
                img, boxes, valid, 32, 128,
                aspect=(jnp.float32(1.0), jnp.float32(1.0)),
            )
        )
        assert (a == b).all()
