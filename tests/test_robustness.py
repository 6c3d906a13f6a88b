"""Failure-path robustness (SURVEY §5.3): corrupt checkpoints, bad charsets,
mixed-validity inputs must degrade cleanly, not crash."""

import numpy as np
import pytest

from manuscript_tpu.recognizers import TRBA
from manuscript_tpu.recognizers.charset import load_charset


class TestCheckpointRobustness:
    def test_corrupt_msgpack_raises_cleanly(self, tmp_path):
        bad = tmp_path / "weights.msgpack"
        bad.write_bytes(b"\x00\x01 not a checkpoint")
        with pytest.raises(Exception):
            TRBA(model_path=str(bad))

    def test_torch_checkpoint_with_garbage_keys(self, tmp_path):
        torch = pytest.importorskip("torch")
        p = tmp_path / "weights.pth"
        torch.save({"totally": torch.zeros(3), "unrelated.keys": torch.ones(2)}, p)
        # loads with zero matched tensors → random init, but must not crash
        model = TRBA(model_path=str(p))
        out = model.predict(
            np.zeros((20, 60, 3), np.uint8), mode="greedy", batch_size=1
        )
        assert len(out) == 1


class TestCharsetRobustness:
    def test_charset_missing_specials_raises(self, tmp_path):
        p = tmp_path / "charset.txt"
        p.write_text("a\nb\nc\n")
        with pytest.raises(KeyError):
            TRBA(charset_path=str(p))

    def test_blank_lines_skipped(self, tmp_path):
        p = tmp_path / "charset.txt"
        p.write_text("<PAD>\n\n<SOS>\n<EOS>\n\na\n")
        itos, stoi = load_charset(str(p))
        assert itos == ["<PAD>", "<SOS>", "<EOS>", "a"]


class TestDatasetRobustness:
    def test_unreadable_image_retries_alternative(self, tmp_path, rng):
        from PIL import Image

        from manuscript_tpu.recognizers.charset import default_charset
        from manuscript_tpu.train.trba_dataset import OCRDataset

        stoi = {s: i for i, s in enumerate(default_charset())}
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        Image.fromarray(
            rng.integers(0, 255, (20, 40, 3), dtype=np.uint8)
        ).save(img_dir / "good.png")
        (img_dir / "bad.png").write_bytes(b"not an image")
        (tmp_path / "labels.tsv").write_text("good.png\tok\nbad.png\tbad")

        ds = OCRDataset(str(tmp_path / "labels.tsv"), str(img_dir), stoi, max_len=5)
        assert len(ds) == 2  # validation only checks existence
        # loading the corrupt sample falls back to a random healthy one
        for i in range(len(ds)):
            img, text = ds[i]
            assert img.shape[2] == 3
