"""Dataset-layer unit tests: EAST label synthesis and the OCR CSV stack."""

import json

import numpy as np
import pytest
from PIL import Image

from manuscript_tpu.ops.decode import decode_quads_numpy
from manuscript_tpu.recognizers.charset import default_charset
from manuscript_tpu.train.east_dataset import (
    EASTDataset,
    batch_iterator,
    color_jitter,
    min_area_quad,
    order_vertices_clockwise,
    rasterize_quad_maps,
    shrink_quad,
)
from manuscript_tpu.train.trba_dataset import (
    AugmentParams,
    OCRDataset,
    augment_word_image,
    build_file_index,
    collate_attention,
    proportional_batches,
    read_label_file,
)

STOI = {s: i for i, s in enumerate(default_charset())}


class TestEASTLabels:
    def test_order_vertices_clockwise(self):
        poly = np.array([[10, 0], [0, 0], [0, 5], [10, 5]], np.float32)
        out = order_vertices_clockwise(poly)
        np.testing.assert_array_equal(
            out, [[0, 0], [10, 0], [10, 5], [0, 5]]
        )

    def test_shrink_quad_moves_inward(self):
        quad = np.array([[0, 0], [20, 0], [20, 10], [0, 10]], np.float32)
        shrunk = shrink_quad(quad, 0.3)
        c = quad.mean(axis=0)
        assert np.all(
            np.linalg.norm(shrunk - c, axis=1) < np.linalg.norm(quad - c, axis=1)
        )

    def test_min_area_quad_of_rect_points(self):
        pts = np.array([[0, 0], [10, 0], [10, 4], [0, 4], [5, 2]], np.float32)
        quad = min_area_quad(pts)
        assert quad.shape == (4, 2)
        # area ≈ 40
        x, y = quad[:, 0], quad[:, 1]
        area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
        assert area == pytest.approx(40, rel=0.05)

    def test_rasterize_and_decode_roundtrip(self):
        """Labels must decode back (via the inference decoder + expansion)
        to roughly the original quad — the core label/decode contract."""
        quad = np.array([[40, 40], [120, 40], [120, 80], [40, 80]], np.float32)
        score, geo = rasterize_quad_maps([quad], target_size=160, score_geo_scale=0.25)
        assert score.shape == (40, 40)
        assert score.sum() > 0
        decoded = decode_quads_numpy(score, geo, 0.5, scale=4.0, quantization=1)
        assert len(decoded) > 0
        # every decoded candidate reconstructs the SHRUNK quad vertices
        shrunk = shrink_quad(quad, 0.3)
        mean_quad = decoded[:, :8].mean(axis=0).reshape(4, 2)
        np.testing.assert_allclose(mean_quad, shrunk, atol=6.0)

    def test_color_jitter_valid_range(self, rng):
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        out = color_jitter(img, rng)
        assert out.dtype == np.uint8
        assert out.shape == img.shape

    def test_dataset_filtering_and_iteration(self, tmp_path, rng):
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            ).save(img_dir / f"{i}.png")
            images.append({"id": i, "file_name": f"{i}.png", "width": 64, "height": 64})
        anns.append({"id": 1, "image_id": 0,
                     "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]})
        anns.append({"id": 2, "image_id": 1, "segmentation": [[1, 1]]})  # invalid
        # image 2: no annotations at all
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps({"images": images, "annotations": anns}))

        with pytest.warns(UserWarning):
            ds = EASTDataset(img_dir, ann_file, target_size=64, augment=False)
        assert len(ds) == 1  # only image 0 survives

        batches = list(batch_iterator(ds, batch_size=2, include_quads=True))
        assert batches[0]["image"].shape == (1, 64, 64, 3)
        assert batches[0]["score"].shape == (1, 16, 16)
        assert batches[0]["geo"].shape == (1, 16, 16, 8)
        assert len(batches[0]["quads"][0]) == 1

    def test_map_cache_budget(self, tmp_path, rng):
        """The label-map cache stops growing past its byte budget (review
        finding: unbounded caching OOMs the host on large corpora) while
        items past the budget still return correct maps."""
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            ).save(img_dir / f"{i}.png")
            images.append(
                {"id": i, "file_name": f"{i}.png", "width": 64, "height": 64}
            )
            anns.append({"id": i + 1, "image_id": i,
                         "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]})
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps({"images": images, "annotations": anns}))

        # one 64²-sample's maps are 16*16*4 + 16*16*8*4 = 9216 bytes;
        # budget two samples' worth
        ds = EASTDataset(
            img_dir, ann_file, target_size=64, augment=False,
            cache_maps_mb=2 * 9216 / 1e6,
        )
        first = [ds[i] for i in range(4)]
        assert len(ds._map_cache) == 2
        assert ds._map_cache_bytes <= ds._map_cache_budget
        second = [ds[i] for i in range(4)]  # uncached items recompute
        for (i1, s1, g1, _), (i2, s2, g2, _) in zip(first, second):
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_array_equal(g1, g2)
        # zero budget disables caching entirely
        ds0 = EASTDataset(
            img_dir, ann_file, target_size=64, augment=False, cache_maps_mb=0
        )
        ds0[0]
        assert not ds0._map_cache


class TestOCRDataset:
    def _make(self, tmp_path, rng, rows, fmt="tsv"):
        img_dir = tmp_path / "crops"
        img_dir.mkdir(exist_ok=True)
        lines = []
        for name, text in rows:
            if name.endswith(".png"):
                Image.fromarray(
                    rng.integers(0, 255, (20, 50, 3), dtype=np.uint8)
                ).save(img_dir / name)
            sep = "\t" if fmt == "tsv" else ","
            lines.append(f"{name}{sep}{text}")
        label = tmp_path / f"labels.{fmt}"
        label.write_text("\n".join(lines))
        return str(label), str(img_dir)

    def test_validation_skip_report(self, tmp_path, rng):
        rows = [
            ("a.png", "ok"),
            ("missing.jpg", "gone"),  # never written to disk
            ("b.png", "x" * 40),  # too long
            ("c.png", "bad✗char"),
        ]
        label, root = self._make(tmp_path, rng, rows)
        ds = OCRDataset(label, root, STOI, max_len=10)
        assert len(ds) == 1
        assert ds.skip_report["missing_file"] == 1
        assert ds.skip_report["too_long"] == 1
        assert ds.skip_report["charset"] == 1
        assert ds.missing_chars_top[0][0] == "✗"

    def test_csv_header_autodetect(self, tmp_path, rng):
        rows = [("filename", "text"), ("a.png", "hi")]
        label, root = self._make(tmp_path, rng, rows, fmt="csv")
        parsed = read_label_file(label)
        assert parsed == [("a.png", "hi")]

    def test_getitem_resizes(self, tmp_path, rng):
        label, root = self._make(tmp_path, rng, [("a.png", "hello")])
        ds = OCRDataset(label, root, STOI, max_len=10, img_h=32, img_w=96)
        img, text = ds[0]
        assert img.shape == (32, 96, 3)
        assert text == "hello"

    def test_basename_index_fallback(self, tmp_path, rng):
        img_dir = tmp_path / "crops" / "nested" / "deep"
        img_dir.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 255, (20, 50, 3), dtype=np.uint8)
        ).save(img_dir / "w.png")
        label = tmp_path / "labels.tsv"
        label.write_text("w.png\thi")
        ds = OCRDataset(str(label), str(tmp_path / "crops"), STOI, max_len=10)
        assert len(ds) == 1

    def test_collate_targets(self, tmp_path, rng):
        label, root = self._make(tmp_path, rng, [("a.png", "ab")])
        ds = OCRDataset(label, root, STOI, max_len=5)
        batch = collate_attention([ds[0]], STOI, max_len=5)
        assert batch["image"].shape[0] == 1
        assert batch["text_in"][0, 0] == STOI["<SOS>"]
        assert batch["target_y"][0, 2] == STOI["<EOS>"]
        assert batch["lengths"][0] == 3

    def test_proportional_batches_mix(self):
        class FakeDS:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

        batches = list(
            proportional_batches([FakeDS(100), FakeDS(10)], [0.5, 0.5], 8, seed=0)
        )
        for batch in batches:
            ds_ids = [d for d, _ in batch]
            assert ds_ids.count(0) == 4
            assert ds_ids.count(1) == 4  # small set reshuffles on exhaust

    def test_augment_preserves_shape(self, rng):
        img = rng.integers(0, 255, (30, 80, 3), dtype=np.uint8)
        p = AugmentParams(p_shift_scale_rotate=1.0, p_brightness_contrast=1.0,
                          invert_p=1.0)
        out = augment_word_image(img, rng, p)
        assert out.shape == img.shape
        assert out.dtype == np.uint8

    def test_build_file_index(self, tmp_path, rng):
        d = tmp_path / "x" / "y"
        d.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(d / "IMG.PNG")
        idx = build_file_index(str(tmp_path))
        assert "img.png" in idx


class TestDeviceDataset:
    """HBM-resident dataset path (east_train.DeviceDataset): gather parity
    with the host loader and data-axis sharding of the gathered batch."""

    def _tiny_ds(self, tmp_path, rng):
        img_dir = tmp_path / "dimgs"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            ).save(img_dir / f"{i}.png")
            images.append(
                {"id": i, "file_name": f"{i}.png", "width": 64, "height": 64}
            )
            anns.append(
                {"id": i + 1, "image_id": i,
                 "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]}
            )
        ann_file = tmp_path / "dann.json"
        ann_file.write_text(
            json.dumps({"images": images, "annotations": anns})
        )
        return EASTDataset(img_dir, ann_file, target_size=64, augment=False)

    def test_gather_parity_and_sharding(self, tmp_path, rng):
        import jax

        from manuscript_tpu.parallel.mesh import make_mesh
        from manuscript_tpu.train.east_train import DeviceDataset

        ds = self._tiny_ds(tmp_path, rng)
        mesh = make_mesh(n_devices=2)
        dev = DeviceDataset(ds, mesh, augment=False)
        idx = np.array([2, 0])
        img, score, geo = dev.batch(idx)
        for j, i in enumerate(idx):
            h_img, h_score, h_geo = ds[int(i)][:3]
            np.testing.assert_array_equal(np.asarray(img)[j], h_img)
            np.testing.assert_allclose(np.asarray(score)[j], h_score)
            np.testing.assert_allclose(np.asarray(geo)[j], h_geo)
        # gathered batch is laid out over the data axis, one sample/device
        assert len(img.sharding.device_set) == 2
        assert img.addressable_shards[0].data.shape[0] == 1

    def test_augment_and_multiscale_on_device(self, tmp_path, rng):
        from manuscript_tpu.parallel.mesh import make_mesh
        from manuscript_tpu.train.east_train import DeviceDataset

        ds = self._tiny_ds(tmp_path, rng)
        mesh = make_mesh(n_devices=2)
        dev = DeviceDataset(ds, mesh, augment=True, seed=3)
        # odd batch wraps to divide the mesh evenly
        img, score, geo = dev.batch(np.array([0, 1, 2]), side=32, step=5)
        assert img.shape == (4, 32, 32, 3)
        assert score.shape[0] == 4 and geo.shape[0] == 4
        assert img.dtype == np.uint8
        # jittered gather differs from the raw pixels but stays in range
        raw = ds[0][0]  # ds[i] yields (img, score, geo, quads)
        a = np.asarray(img)[0]
        assert a.shape != raw.shape or not np.array_equal(a, raw)
        # distinct steps draw distinct jitter factors
        img2 = dev.batch(np.array([0, 1, 2]), side=32, step=6)[0]
        assert not np.array_equal(np.asarray(img), np.asarray(img2))
