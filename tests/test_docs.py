"""Docs-as-tests (reference pattern: tests/test_detector_docs.py).

Every fenced python block in docs/ and README.md must at least parse; the
README quick-start is executed end-to-end against stubbed backends.
"""

import ast
import re
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DOC_FILES = sorted(
    list((REPO / "docs").glob("*.md")) + [REPO / "README.md", REPO / "DEPLOYMENT.md"]
)

FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks():
    out = []
    for path in DOC_FILES:
        for i, m in enumerate(FENCE.finditer(path.read_text())):
            out.append(pytest.param(m.group(1), id=f"{path.name}#{i}"))
    return out


@pytest.mark.parametrize("code", _blocks())
def test_docs_python_blocks_parse(code):
    # blocks with CLI-style or elided content are still required to parse
    # once ellipsis placeholders are neutralized
    cleaned = textwrap.dedent(code)
    if "=..." in cleaned.replace(" ", ""):
        cleaned = cleaned.replace("...", "pass_")
    try:
        ast.parse(cleaned)
    except SyntaxError:
        # tolerate interactive doctest-style blocks
        if cleaned.lstrip().startswith(">>>"):
            pytest.skip("doctest-style block")
        raise


def test_readme_quickstart_runs(monkeypatch, tmp_path, rng):
    """The README example (Pipeline().predict + get_text) must run verbatim
    with stubbed default models."""
    from PIL import Image

    import manuscript_tpu
    from manuscript_tpu.types import Block, Page, Word

    page_obj = Page(
        blocks=[
            Block(
                words=[
                    Word(
                        polygon=[(0, 0), (10, 0), (10, 5), (0, 5)],
                        detection_confidence=0.9,
                    )
                ]
            )
        ]
    )

    class StubEAST:
        def __init__(self, *a, **k):
            pass

        def predict(self, image, vis=False, profile=False):
            return {"page": page_obj.model_copy(deep=True), "vis_image": None}

    class StubTRBA:
        def __init__(self, *a, **k):
            pass

        def predict(self, images, **kw):
            return [{"text": "hello", "confidence": 0.9} for _ in images]

    import manuscript_tpu.detectors as d
    import manuscript_tpu.recognizers as r

    monkeypatch.setattr(d, "EAST", StubEAST)
    monkeypatch.setattr(r, "TRBA", StubTRBA)

    img_path = tmp_path / "manuscript_page.jpg"
    Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(img_path)

    # — README quick-start —
    from manuscript_tpu import Pipeline

    pipeline = Pipeline()
    page = pipeline.predict(str(img_path))
    text = pipeline.get_text(page)
    assert text == "hello"
