"""Recognizer demo: beam vs greedy decoding throughput on word crops.

Equivalent of the reference's trba_infer.py FPS comparison.
"""

import glob
import sys
import time

from manuscript_tpu.recognizers import TRBA

CROPS_GLOB = sys.argv[1] if len(sys.argv) > 1 else "crops/*.png"
BATCH = 16


def main():
    model = TRBA()
    images = sorted(glob.glob(CROPS_GLOB))
    if not images:
        print(f"no images matched {CROPS_GLOB}")
        return

    for mode, kwargs in (
        ("greedy", {}),
        ("beam", dict(beam_size=8, temperature=1.7, alpha=0.9)),
    ):
        model.predict(images[:BATCH], batch_size=BATCH, mode=mode, **kwargs)  # warmup
        t0 = time.time()
        results = model.predict(images, batch_size=BATCH, mode=mode, **kwargs)
        dt = time.time() - t0
        print(f"{mode}: {len(images)/dt:.1f} crops/s")
        for path, r in list(zip(images, results))[:5]:
            print(f"  {path}: {r['text']!r} ({r['confidence']:.3f})")


if __name__ == "__main__":
    main()
