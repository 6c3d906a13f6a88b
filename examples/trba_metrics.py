"""Standalone recognizer evaluation: Accuracy / CER / WER / FPS against a
TSV ground truth (filename<TAB>text), like the reference's trba_metrics.py —
using the dict-returning predict API (the reference script's tuple unpack is
stale; SURVEY.md §7 quirks).
"""

import os
import sys
import time

from manuscript_tpu.recognizers import TRBA
from manuscript_tpu.train.metrics import aggregate_text_metrics
from manuscript_tpu.train.trba_dataset import read_label_file

GT_TSV = sys.argv[1] if len(sys.argv) > 1 else "val/labels.tsv"
IMG_ROOT = sys.argv[2] if len(sys.argv) > 2 else "val/images"
BATCH = 32
MODE = os.environ.get("MODE", "greedy")


def main():
    rows = read_label_file(GT_TSV)
    paths, refs = [], []
    for name, text in rows:
        p = os.path.join(IMG_ROOT, name)
        if os.path.exists(p):
            paths.append(p)
            refs.append(text)
    print(f"evaluating {len(paths)} images, mode={MODE}")

    model = TRBA()
    model.predict(paths[:BATCH], batch_size=BATCH, mode=MODE)  # warmup/compile
    t0 = time.time()
    results = model.predict(paths, batch_size=BATCH, mode=MODE)
    dt = time.time() - t0

    hyps = [r["text"] for r in results]
    metrics = aggregate_text_metrics(refs, hyps)
    print(
        f"Accuracy: {metrics['accuracy']:.4f}  CER: {metrics['cer']:.4f}  "
        f"WER: {metrics['wer']:.4f}  FPS: {len(paths)/dt:.1f}"
    )


if __name__ == "__main__":
    main()
