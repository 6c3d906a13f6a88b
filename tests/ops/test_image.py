import numpy as np
import pytest
from PIL import Image

from manuscript_tpu.ops.image import (
    batch_resize_and_pad,
    crop_axis_aligned,
    delta_decode_device,
    delta_encode,
    detector_preprocess_host,
    fold_channels,
    normalize_u8,
    read_image,
    resize_and_pad,
    unfold_channels_device,
)


class TestReadImage:
    def test_ndarray_passthrough(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        assert read_image(img) is img

    def test_file_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / "x.png"
        Image.fromarray(img).save(p)
        out = read_image(str(p))
        np.testing.assert_array_equal(out, img)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            read_image("/nonexistent/file.png")

    def test_bad_type(self):
        with pytest.raises(TypeError):
            read_image(42)


class TestResizeAndPad:
    def test_output_shape_and_white_padding(self):
        img = np.zeros((50, 50, 3), dtype=np.uint8)  # square → height-limited
        out = resize_and_pad(img, 64, 256)
        assert out.shape == (64, 256, 3)
        # left-aligned: content in first 64 cols, right side white padding
        assert np.all(out[:, 64:] == 255)
        assert np.any(out[:, :64] == 0)

    def test_wide_image_fits_width(self):
        img = np.zeros((10, 1000, 3), dtype=np.uint8)
        out = resize_and_pad(img, 64, 256)
        assert out.shape == (64, 256, 3)

    def test_vertical_centering(self):
        img = np.zeros((10, 256, 3), dtype=np.uint8)
        out = resize_and_pad(img, 64, 256)
        # content centered vertically: top and bottom rows white
        assert np.all(out[0] == 255)
        assert np.all(out[-1] == 255)
        assert np.any(out[32] == 0)

    def test_grayscale_input(self):
        img = np.zeros((10, 10), dtype=np.uint8)
        out = resize_and_pad(img, 64, 256)
        assert out.shape == (64, 256, 3)

    def test_rgba_input(self):
        img = np.zeros((10, 10, 4), dtype=np.uint8)
        out = resize_and_pad(img, 64, 256)
        assert out.shape == (64, 256, 3)

    def test_batch(self):
        imgs = [np.zeros((h, 20, 3), dtype=np.uint8) for h in (5, 10, 40)]
        out = batch_resize_and_pad(imgs, 64, 256)
        assert out.shape == (3, 64, 256, 3)


class TestNormalize:
    def test_range(self):
        x = np.array([0, 127.5, 255], dtype=np.uint8).reshape(3, 1)
        out = np.asarray(normalize_u8(x))
        np.testing.assert_allclose(out[:, 0], [-1.0, 0.0, 1.0], atol=0.01)


class TestCrop:
    def test_basic(self):
        img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
        poly = np.array([[10, 20], [30, 20], [30, 40], [10, 40]])
        out = crop_axis_aligned(img, poly)
        assert out.shape == (20, 20, 3)
        np.testing.assert_array_equal(out, img[20:40, 10:30])

    def test_clamps_to_bounds(self):
        img = np.zeros((50, 50, 3), dtype=np.uint8)
        poly = np.array([[-10, -10], [60, -10], [60, 60], [-10, 60]])
        out = crop_axis_aligned(img, poly)
        assert out.shape == (50, 50, 3)

    def test_empty_returns_none(self):
        img = np.zeros((50, 50, 3), dtype=np.uint8)
        poly = np.array([[60, 60], [70, 60], [70, 70], [60, 70]])
        assert crop_axis_aligned(img, poly) is None


def test_detector_preprocess_shape():
    img = np.zeros((123, 456, 3), dtype=np.uint8)
    out = detector_preprocess_host(img, 256)
    assert out.shape == (256, 256, 3)


class TestChannelFold:
    def test_gray_as_rgb_folds_exact(self):
        rng = np.random.default_rng(0)
        g = rng.integers(0, 256, (40, 30), dtype=np.uint8)
        img = np.repeat(g[..., None], 3, axis=-1)
        folded = fold_channels(img)
        np.testing.assert_array_equal(folded, g)

    def test_color_does_not_fold(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[0, 0, 1] = 1  # one off-gray pixel
        assert fold_channels(img) is None

    def test_tolerance_folds_near_gray(self):
        rng = np.random.default_rng(1)
        g = rng.integers(2, 254, (16, 16), dtype=np.uint8)
        img = np.repeat(g[..., None], 3, axis=-1)
        img[..., 1] = img[..., 1] + 2  # JPEG-ish chroma noise
        assert fold_channels(img) is None
        folded = fold_channels(img, tol=2)
        np.testing.assert_array_equal(folded, g)  # channel 0

    def test_non_rgb_shapes_return_none(self):
        assert fold_channels(np.zeros((8, 8), np.uint8)) is None
        assert fold_channels(np.zeros((8, 8, 4), np.uint8)) is None

    def test_device_roundtrip_fold_delta(self):
        """fold → delta → device delta-decode → unfold is bit-exact."""
        rng = np.random.default_rng(2)
        g = rng.integers(0, 256, (32, 24), dtype=np.uint8)
        img = np.repeat(g[..., None], 3, axis=-1)
        wire = delta_encode(fold_channels(img))
        assert wire.shape == (32, 24)  # 3x fewer bytes on the link
        back = np.asarray(
            unfold_channels_device(delta_decode_device(wire))
        )
        np.testing.assert_array_equal(back, img)
