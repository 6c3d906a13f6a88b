"""CLI smoke tests with fake backends injected via monkeypatching the
Pipeline/EAST/TRBA constructors (docs-as-tests style, reference:
tests/test_detector_docs.py pattern)."""

import json

import numpy as np
import pytest
from PIL import Image

import manuscript_tpu.__main__ as cli
from manuscript_tpu.types import Block, Page, Word


def _fake_page():
    return Page(
        blocks=[
            Block(
                words=[
                    Word(
                        polygon=[(1, 1), (9, 1), (9, 5), (1, 5)],
                        detection_confidence=0.9,
                        text="hello",
                        recognition_confidence=0.8,
                    )
                ]
            )
        ]
    )


@pytest.fixture
def image_file(tmp_path, rng):
    p = tmp_path / "page.png"
    Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(p)
    return str(p)


def test_ocr_command(monkeypatch, capsys, image_file, tmp_path):
    class FakePipe:
        def predict(self, image, vis=False, profile=False):
            return _fake_page()

        def get_text(self, page):
            return "hello"

    monkeypatch.setattr("manuscript_tpu.Pipeline", lambda **kw: FakePipe())
    out_json = tmp_path / "r.json"
    cli.main(["ocr", image_file, "--out", str(out_json)])
    data = json.loads(out_json.read_text())
    assert data["text"] == "hello"
    assert data["page"]["blocks"][0]["words"][0]["text"] == "hello"


def test_detect_command(monkeypatch, capsys, image_file):
    class FakeEAST:
        def __init__(self, **kw):
            self.kw = kw

        def predict(self, image, vis=False, profile=False):
            return {"page": _fake_page(), "vis_image": None}

    import manuscript_tpu.detectors as d

    monkeypatch.setattr(d, "EAST", FakeEAST)
    cli.main(["detect", image_file, "--thresh", "0.8"])
    assert "1 words" in capsys.readouterr().out


def test_recognize_command(monkeypatch, capsys, image_file):
    class FakeTRBA:
        def __init__(self, **kw):
            pass

        def predict(self, images, batch_size=32, mode="beam", beam_size=8):
            return [{"text": "word", "confidence": 0.75} for _ in images]

    import manuscript_tpu.recognizers as r

    monkeypatch.setattr(r, "TRBA", FakeTRBA)
    cli.main(["recognize", image_file, "--mode", "greedy"])
    out = capsys.readouterr().out
    assert "word" in out and "0.7500" in out


def test_unknown_command_exits():
    with pytest.raises(SystemExit):
        cli.main(["nonsense"])


def test_ocr_command_multi_image_batches(monkeypatch, capsys, image_file):
    """Multiple images route through process_batch (chunked fused path)."""
    calls = {}

    class FakePipe:
        def process_batch(self, images, profile=False):
            calls["n"] = len(images)
            return [_fake_page() for _ in images]

        def predict(self, image, vis=False, profile=False):  # pragma: no cover
            raise AssertionError("multi-image ocr must use process_batch")

        def get_text(self, page):
            return "hello"

    monkeypatch.setattr("manuscript_tpu.Pipeline", lambda **kw: FakePipe())
    cli.main(["ocr", image_file, image_file, "--mode", "greedy"])
    assert calls["n"] == 2
    assert capsys.readouterr().out.count("hello") == 2


def test_ocr_n_devices_builds_mesh(monkeypatch, capsys, image_file):
    """--n-devices N plumbs a data mesh into the Pipeline (multi-chip
    inference from the CLI); default stays mesh-free."""
    seen = {}

    class FakePipe:
        def __init__(self, **kw):
            seen.update(kw)

        def predict(self, image, vis=False, profile=False):
            return _fake_page()

        def get_text(self, page):
            return "hello"

    monkeypatch.setattr("manuscript_tpu.Pipeline", FakePipe)
    cli.main(["ocr", image_file])
    assert seen["mesh"] is None

    cli.main(["ocr", image_file, "--n-devices", "2"])
    mesh = seen["mesh"]
    assert mesh is not None
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 1


def test_compile_cache_env_resolution(monkeypatch, tmp_path):
    """One env var warms every entry point: MANUSCRIPT_TPU_JAX_CACHE wins
    over the caller's default dir; with neither, the call is a no-op (CPU
    hosts must opt in — see utils/compile_cache.py)."""
    import jax

    from manuscript_tpu.utils.compile_cache import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    before_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    before_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        monkeypatch.delenv("MANUSCRIPT_TPU_JAX_CACHE", raising=False)
        assert enable_compile_cache(None) is None
        assert jax.config.jax_compilation_cache_dir == before

        got = enable_compile_cache(str(tmp_path / "default"))
        assert got == str(tmp_path / "default")
        assert jax.config.jax_compilation_cache_dir == got

        monkeypatch.setenv("MANUSCRIPT_TPU_JAX_CACHE", str(tmp_path / "env"))
        assert enable_compile_cache(str(tmp_path / "default")) == str(
            tmp_path / "env"
        )
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "env")
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", before_secs
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", before_bytes
        )
