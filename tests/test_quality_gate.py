"""Trained-weights quality gate (slow tier).

Loads the COMMITTED synthetic-trained micro checkpoints
(manuscript_tpu/configs/quality/, produced by examples/make_quality_ckpt.py
— real TRBA.train/EAST.train runs) and scores the real fused pipeline on
held-out synthetic pages (disjoint seeds). Hard thresholds: any numerics
regression in the detector, NMS, crop-gather, recognizer, or decode shows
up here as F1/CER movement — with NON-random weights, unlike the
throughput bench.

Also exercises the golden-parity fixture loop end-to-end (VERDICT r3 #6):
examples/parity_fixture.json was written by
``parity_check.py --quality --synthetic 9100 --write-fixture`` on this
backend (CPU); re-running must reproduce it.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from manuscript_tpu.utils.quality import (
    quality_ckpts_available,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not quality_ckpts_available(),
        reason="no committed quality checkpoints",
    ),
]

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def quality_models():
    from manuscript_tpu.utils.quality import load_quality_models

    return load_quality_models()


def test_detector_f1_and_e2e_cer(quality_models):
    from manuscript_tpu.utils.quality import evaluate_quality

    m = evaluate_quality(
        n_pages=4, seed=9000, mode="greedy", models=quality_models
    )
    # thresholds deliberately below the trained model's measured headroom
    # (make_quality_ckpt eval prints the current numbers) so the gate trips
    # on real regressions, not run-to-run noise
    assert m["detector_f1"] >= 0.90, m
    assert m["e2e_cer"] <= 0.20, m
    assert m["word_acc"] >= 0.60, m


def test_hostcrop_path_quality(quality_models):
    """The classic (host full-res crop) path through the same models must
    also clear the gate — it shares detection but not the device
    crop-gather, so the two paths bound each other."""
    from manuscript_tpu.utils.quality import evaluate_quality

    m = evaluate_quality(
        n_pages=4, seed=9000, mode="greedy", use_fused=False,
        models=quality_models,
    )
    assert m["detector_f1"] >= 0.90, m
    assert m["e2e_cer"] <= 0.20, m


def test_parity_fixture_reproduces(quality_models):
    """Golden-output parity: the committed fixture regenerates exactly
    (boxes F1 ≥ 0.95 @ IoU 0.7, ≥95% exact texts) — the pinning machinery
    the released-weights loop would use, proven on the synthetic model."""
    fixture_path = REPO / "examples" / "parity_fixture.json"
    if not fixture_path.exists():
        pytest.skip("no committed parity fixture")
    fixture = json.loads(fixture_path.read_text())
    assert fixture["image"].startswith("synthetic:")
    seed = int(fixture["image"].split(":")[1])

    from manuscript_tpu.pipeline import Pipeline
    from manuscript_tpu.utils.synthetic import render_page

    east, trba = quality_models
    pipe = Pipeline(
        detector=east, recognizer=trba, mode="greedy", max_words=64
    )
    rng = np.random.default_rng(seed)
    image, _ = render_page(rng)
    page = pipe.predict(image)
    words = [
        {"polygon": [[float(x), float(y)] for x, y in w.polygon],
         "text": w.text}
        for b in page.blocks
        for w in b.words
    ]

    import sys

    sys.path.insert(0, str(REPO / "examples"))
    from parity_check import axis_iou

    fwords = fixture["words"]
    matched, text_ok = 0, 0
    used = set()
    for fw in fwords:
        best, best_iou = None, 0.0
        for i, w in enumerate(words):
            if i in used:
                continue
            iou = axis_iou(fw["polygon"], w["polygon"])
            if iou > best_iou:
                best, best_iou = i, iou
        if best is not None and best_iou >= 0.7:
            used.add(best)
            matched += 1
            if (words[best]["text"] or "") == (fw["text"] or ""):
                text_ok += 1
    prec = matched / max(len(words), 1)
    rec = matched / max(len(fwords), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.95, (f1, matched, len(fwords), len(words))
    assert text_ok >= int(0.95 * max(matched, 1)), (text_ok, matched)
