"""Structural checks on the committed notebooks.

The reference ships *executed* notebooks (detector/recognizer training
walkthroughs, e.g. ``Пример_обучения_распознавателя_новый.ipynb``); parity
here means our notebooks stay valid, executed, and error-free without
re-running them in CI (execution happens offline on commit).
"""

import json
from pathlib import Path

import pytest

NB_DIR = Path(__file__).resolve().parent.parent / "notebooks"
NOTEBOOKS = sorted(NB_DIR.glob("*.ipynb"))


def test_notebooks_present():
    names = {p.name for p in NOTEBOOKS}
    # The walkthrough set promised by README/SURVEY: quickstart, the three
    # detector notebooks, and the recognizer-training walkthrough.
    assert {
        "quickstart.ipynb",
        "detector_inference.ipynb",
        "detector_training.ipynb",
        "detector_latency.ipynb",
        "recognizer_training.ipynb",
    } <= names


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_valid_and_clean(path):
    nb = json.loads(path.read_text())
    assert nb.get("nbformat", 0) >= 4
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert code_cells, f"{path.name} has no code cells"
    for cell in code_cells:
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", (
                f"{path.name} contains an error output: "
                f"{out.get('ename')}: {out.get('evalue')}"
            )


def test_recognizer_training_notebook_executed():
    """The recognizer walkthrough must carry real executed outputs: the
    training summary, the artifact listing, and the sweep result."""
    nb = json.loads((NB_DIR / "recognizer_training.ipynb").read_text())
    stream = ""
    for cell in nb["cells"]:
        for out in cell.get("outputs", []):
            if out.get("output_type") == "stream":
                stream += "".join(out.get("text", []))
            elif "text/plain" in out.get("data", {}):
                stream += "".join(out["data"]["text/plain"])
    assert "metrics_epoch" in stream or "epoch" in stream
    assert "best_acc.msgpack" in stream
    assert "best:" in stream  # sweep result cell
    assert "freeze policies active" in stream
