"""High-throughput OCR over many pages (BASELINE.md config 4).

Pages ride the chunked fused device program (`Pipeline.process_batch` →
`FusedOCR.predict_many`): `batch_pages` pages per upload/dispatch/fetch,
with the next chunk prepared while the current one computes. On one v5e
this sustains ~4× the single-page-at-a-time rate.

    python examples/batch_infer.py page1.jpg page2.jpg ...
    python examples/batch_infer.py --glob 'scans/*.png'
"""

import glob
import sys
import time

from manuscript_tpu import Pipeline


def main(argv):
    if argv and argv[0] == "--glob":
        paths = sorted(glob.glob(argv[1]))
    else:
        paths = list(argv)
    if not paths:
        print(__doc__)
        return

    pipeline = Pipeline(mode="greedy", batch_pages=4)
    pipeline.predict(paths[0])  # absorb compile + link handshake

    t0 = time.time()
    pages = pipeline.process_batch(paths)
    dt = time.time() - t0
    for path, page in zip(paths, pages):
        n = sum(len(b.words) for b in page.blocks)
        first = pipeline.get_text(page).split("\n")[0][:60]
        print(f"{path}: {n} words | {first}")
    print(f"\n{len(paths)} pages in {dt:.2f}s = {len(paths)/dt:.2f} pages/s")


if __name__ == "__main__":
    main(sys.argv[1:])
