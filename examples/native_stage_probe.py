"""Stage-latency probe for the native-crop pipeline (fused.predict_many).

Times each stage of the four-stage software pipeline on real hardware —
page prep (thread A), phase-A dispatch, box-fetch + cv2 crops + strip
upload (crop workers), phase-B dispatch, result fetch + page build
(finish thread) — by wrapping the stage methods of a live FusedOCR and
running one 24-page batch. This is the measurement that motivated the
round-5 pipeline rebuild (BASELINE.md "Round-5 full bench run" notes):
with one crop worker the pipeline period equalled the crop chain's full
serial latency (~200 ms/chunk vs ~80 ms device compute).

Usage::

    python examples/native_stage_probe.py            # chip (or CPU)
    python examples/native_stage_probe.py --pages 48
"""

from __future__ import annotations

import argparse
import collections
import os
import statistics
import sys
import time

os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", type=int, default=24)
    ap.add_argument("--target-size", type=int, default=1280)
    args = ap.parse_args()

    from manuscript_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_bench_cache")
    )

    import jax.numpy as jnp

    from bench import build_page, probe_link
    from manuscript_tpu.detectors import EAST
    from manuscript_tpu.fused import FusedOCR
    from manuscript_tpu.recognizers import TRBA

    east = EAST(
        target_size=args.target_size, max_candidates=4096,
        dtype=jnp.bfloat16,
    )
    trba = TRBA(dtype=jnp.bfloat16)
    pages = [build_page(i) for i in range(args.pages)]
    fused = FusedOCR(east, trba, mode="beam")
    fused.calibrate(pages[0], target_max_words=250)
    fused.predict_many(pages)  # warm (incl. any capacity growth)

    acc = collections.defaultdict(list)

    def timed(name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            acc[name].append(time.perf_counter() - t0)
            return out

        return wrapped

    for m in (
        "_prepare_chunk",
        "_dispatch_detect_prepared",
        "_crop_stage",
        "_dispatch_rec_chunk",
        "_finish_rec_chunk",
        "_fetch",
    ):
        setattr(fused, m, timed(m, getattr(fused, m)))

    p0, _ = probe_link(pages[0], east.target_size)
    t0 = time.perf_counter()
    fused.predict_many(pages)
    dt = time.perf_counter() - t0
    p1, _ = probe_link(pages[0], east.target_size)

    print(
        f"total {dt:.3f}s  {len(pages) / dt:.2f} pages/s  "
        f"link probe {p0:.4f}->{p1:.4f}s"
    )
    for name, times in acc.items():
        print(
            f"{name:28s} n={len(times):3d} sum={sum(times):7.3f}s "
            f"median={statistics.median(times) * 1e3:7.1f}ms"
        )


if __name__ == "__main__":
    main()
