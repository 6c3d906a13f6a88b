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


class TestTPESampler:
    def test_tpe_beats_random_on_quadratic(self):
        """TPE must concentrate samples near the optimum of a smooth
        objective clearly faster than uniform sampling."""
        import numpy as np

        def run(sampler, seed):
            s = Study(
                space={"x": ("float", -5.0, 5.0), "y": ("float", -5.0, 5.0)},
                direction="minimize",
                seed=seed,
                n_warmup=8,
                sampler=sampler,
            )
            s.optimize(lambda p: (p["x"] - 1.3) ** 2 + (p["y"] + 2.1) ** 2, 40)
            return s.best_trial["value"]

        tpe = np.median([run("tpe", s) for s in range(5)])
        # uniform-only baseline: warmup covers all trials
        rnd = np.median(
            [
                Study(
                    space={"x": ("float", -5.0, 5.0), "y": ("float", -5.0, 5.0)},
                    direction="minimize", seed=s, n_warmup=1000,
                ).optimize(
                    lambda p: (p["x"] - 1.3) ** 2 + (p["y"] + 2.1) ** 2, 40
                )["value"]
                for s in range(5)
            ]
        )
        assert tpe < rnd, (tpe, rnd)

    def test_tpe_log_float_and_cat(self):
        s = Study(
            space={
                "lr": ("float", 1e-5, 1.0, "log"),
                "mode": ("cat", ["a", "b"]),
                "n": ("int", 1, 8),
            },
            seed=3,
            n_warmup=5,
        )
        # optimum: lr near 1e-3, mode "b", n high
        import numpy as np

        def obj(p):
            return (
                -abs(np.log10(p["lr"]) + 3.0)
                + (1.0 if p["mode"] == "b" else 0.0)
                + p["n"] / 8.0
            )

        best = s.optimize(obj, 50)
        assert 1e-5 <= best["params"]["lr"] <= 1.0
        assert best["params"]["mode"] in ("a", "b")
        assert s.best_trial["value"] >= -1.5

    def test_sqlite_storage_roundtrip(self, tmp_path):
        db = tmp_path / "study.db"
        s1 = Study(space={"x": ("int", 0, 10)}, storage=db, n_warmup=2)
        s1.optimize(lambda p: p["x"], 4)
        s2 = Study(space={"x": ("int", 0, 10)}, storage=db)
        assert len(s2.trials) == 4
        assert s2.best_trial["value"] == s1.best_trial["value"]
        assert s2.trials[0]["number"] == 0
        s2.tell({"x": 10}, 10.0)  # resumes numbering
        s3 = Study(space={"x": ("int", 0, 10)}, storage=db)
        assert len(s3.trials) == 5 and s3.best_trial["value"] == 10.0

    def test_summary(self):
        s = Study(space={"x": ("int", 0, 3)}, n_warmup=1, seed=0)
        s.optimize(lambda p: p["x"], 3)
        out = s.summary(top=2)
        assert "3 trials" in out and "value=" in out


def test_sweep_report_text_and_html(tmp_path):
    """sweep_report (the optuna-dashboard analog): text summary + a
    self-contained HTML report from either storage backend."""
    from manuscript_tpu.utils.sweep import Study, sweep_report

    st = Study(
        {"a": ("float", 0.0, 1.0), "m": ("cat", ["x", "y"])},
        storage=str(tmp_path / "s.db"),
        direction="maximize",
        n_warmup=2,
    )
    st.optimize(lambda p: p["a"] * (2.0 if p["m"] == "x" else 1.0), 6)
    out_html = tmp_path / "report.html"
    summary = sweep_report(str(tmp_path / "s.db"), out_html=out_html)
    assert "best:" in summary and "6 trials" in summary
    html = out_html.read_text()
    assert "<svg" in html and "Best trial" in html
    assert "value vs a" in html  # per-param scatter
    assert "Categorical means" in html
    # empty study degrades gracefully
    assert "0 trials" in sweep_report(str(tmp_path / "none.json"))


def test_sweep_report_cli(tmp_path, capsys):
    from manuscript_tpu import __main__ as cli
    from manuscript_tpu.utils.sweep import Study

    Study(
        {"a": ("float", 0.0, 1.0)},
        storage=str(tmp_path / "s.json"),
        n_warmup=1,
    ).optimize(lambda p: p["a"], 3)
    cli.main([
        "sweep-report", str(tmp_path / "s.json"),
        "--out", str(tmp_path / "r.html"),
    ])
    assert "best:" in capsys.readouterr().out
    assert (tmp_path / "r.html").exists()
