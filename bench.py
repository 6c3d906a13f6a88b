"""End-to-end benchmark: full OCR pipeline pages/sec on one chip.

Runs the flagship config (BASELINE.md config 1 analog): EAST detect at
1280² + crop + TRBA greedy recognize on a synthetic multi-word manuscript
page, random weights (the released torch checkpoints aren't downloadable in
this environment; compute cost is weight-independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's published mean EAST predict
latency of 0.604 s/page (BASELINE.md — the only recorded number), i.e.
value / (1/0.604).
"""

import json
import sys
import time

import numpy as np

REFERENCE_PAGES_PER_SEC = 1.0 / 0.604  # BASELINE.md: EAST mean 0.604 s/image


def build_page(seed: int = 0, h: int = 2560, w: int = 1920):
    rng = np.random.default_rng(seed)
    page = np.full((h, w, 3), 235, np.uint8)
    for r in range(14):
        for c in range(8):
            y, x = 80 + r * 170, 60 + c * 230
            bh, bw = 60, 180
            page[y : y + bh, x : x + bw] = rng.integers(20, 80)
    return page


def main():
    from manuscript_tpu import Pipeline
    from manuscript_tpu.detectors import EAST
    from manuscript_tpu.recognizers import TRBA

    east = EAST(target_size=1280)
    trba = TRBA()
    pipe = Pipeline(detector=east, recognizer=trba)

    pages = [build_page(i) for i in range(4)]

    # warmup (compiles detector + both recognizer buckets)
    pipe.predict(pages[0])

    n_iters = 8
    t0 = time.time()
    words = 0
    for i in range(n_iters):
        page = pipe.predict(pages[i % len(pages)])
        words += sum(len(b.words) for b in page.blocks)
    dt = time.time() - t0

    pages_per_sec = n_iters / dt
    out = {
        "metric": "e2e_pipeline_pages_per_sec",
        "value": round(pages_per_sec, 4),
        "unit": "pages/s",
        "vs_baseline": round(pages_per_sec / REFERENCE_PAGES_PER_SEC, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
