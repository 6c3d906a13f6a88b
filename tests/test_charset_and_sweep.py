import numpy as np
import pytest

from manuscript_tpu.recognizers.charset import (
    BLANK_TOKEN,
    decode_tokens,
    default_charset,
    load_charset,
    pack_targets,
    save_charset,
)
from manuscript_tpu.utils.sweep import Study


class TestCharset:
    def test_default_has_194_tokens(self):
        cs = default_charset()
        assert len(cs) == 194
        assert cs[:3] == ["<PAD>", "<SOS>", "<EOS>"]
        assert cs[3] == " "
        assert "а" in cs and "Ѣ" in cs and "№" in cs
        assert len(set(cs)) == len(cs)  # no duplicates

    def test_save_load_roundtrip(self, tmp_path):
        cs = default_charset()
        p = tmp_path / "charset.txt"
        save_charset(cs, str(p))
        itos, stoi = load_charset(str(p))
        assert itos == cs
        assert stoi["<EOS>"] == 2

    def test_pack_targets(self):
        cs = default_charset()
        stoi = {s: i for i, s in enumerate(cs)}
        text_in, target_y, lengths = pack_targets(["ab"], stoi, max_len=5)
        assert text_in.shape == (1, 6)
        assert text_in[0, 0] == stoi["<SOS>"]
        assert text_in[0, 1] == stoi["a"]
        assert target_y[0, 0] == stoi["a"]
        assert target_y[0, 2] == stoi["<EOS>"]
        assert lengths[0] == 3

    def test_pack_drops_unknown(self):
        stoi = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "a": 3}
        text_in, target_y, lengths = pack_targets(["aXa"], stoi, max_len=5)
        assert lengths[0] == 3  # two a's + EOS

    def test_pack_truncates(self):
        stoi = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "a": 3}
        _, target_y, lengths = pack_targets(["aaaaaaaaaa"], stoi, max_len=3)
        assert lengths[0] == 4
        assert target_y[0, 3] == 2

    def test_decode_tokens(self):
        itos = ["<PAD>", "<SOS>", "<EOS>", "a", "b"]
        assert decode_tokens([3, 4, 2, 3], itos, 0, 2) == "ab"
        assert decode_tokens([0, 3, 0, 4], itos, 0, 2) == "ab"
        assert decode_tokens([3, 4, 3], itos, 0, 2, blank_id=4) == "aa"


class TestStudy:
    def test_optimize_finds_peak(self, tmp_path):
        study = Study(
            space={"x": ("float", 0.0, 1.0)},
            storage=tmp_path / "study.json",
            n_warmup=5,
            seed=1,
        )
        best = study.optimize(lambda p: -((p["x"] - 0.7) ** 2), n_trials=40)
        assert abs(best["params"]["x"] - 0.7) < 0.1

    def test_persistence_resume(self, tmp_path):
        path = tmp_path / "s.json"
        s1 = Study(space={"x": ("int", 0, 10)}, storage=path)
        s1.optimize(lambda p: p["x"], n_trials=5)
        s2 = Study(space={"x": ("int", 0, 10)}, storage=path)
        assert len(s2.trials) == 5

    def test_categorical_and_int(self):
        s = Study(
            space={"m": ("cat", ["a", "b"]), "k": ("int", 2, 12)},
            n_warmup=3,
            seed=0,
        )
        best = s.optimize(
            lambda p: (1.0 if p["m"] == "b" else 0.0) + p["k"] / 100, 25
        )
        assert best["params"]["m"] == "b"
        assert best["params"]["k"] >= 9

    def test_minimize(self):
        s = Study(space={"x": ("float", -1, 1)}, direction="minimize", seed=2)
        best = s.optimize(lambda p: p["x"] ** 2, 30)
        assert abs(best["params"]["x"]) < 0.3
