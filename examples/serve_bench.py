"""HTTP serving benchmark: sustained requests/s and latency percentiles
through the FULL serving stack on one chip — HTTP parse → body decode →
bounded queue → micro-batcher → fused device program → JSON response.

The reference has no server at all (its Dockerfile CMD runs a demo
script, reference Dockerfile:32), so there is no reference number here;
this records the serving-layer numbers for BASELINE.md that the
throughput bench (bench.py) cannot see: queueing, batch-fill, per-request
codec cost, and tail latency under concurrency.

Codec A/B (``--codec``):

* ``npy``  — raw ``np.save`` bytes (the production fast path added to
  ``OCRServer.decode_image``): ~zero host decode, measures the serving
  ceiling the device + link set.
* ``jpeg`` / ``png`` — PIL-decodable interchange: adds the per-request
  host decode a browser-facing deployment pays (on this one-core host
  that decode is the bottleneck — a realistic frontend would spread it
  over many cores).

Closed-loop load: ``--clients`` threads each POST the same page
back-to-back for ``--seconds``. Prints one JSON line per metric, same
shape as bench.py.

Usage::

    python examples/serve_bench.py                     # npy, 8 clients
    python examples/serve_bench.py --codec jpeg --clients 4
    MANUSCRIPT_TPU_BENCH_SMOKE=1 python examples/serve_bench.py  # CPU self-test
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import threading
import time
import urllib.request

import numpy as np

os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")


def emit(metric, value, unit, **extra):
    line = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    line.update(extra)
    print(json.dumps(line), flush=True)


def encode_body(page: np.ndarray, codec: str) -> bytes:
    if codec == "npy":
        buf = io.BytesIO()
        np.save(buf, page)
        return buf.getvalue()
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(page).save(buf, format=codec.upper())
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--codec", choices=("npy", "jpeg", "png"), default="npy")
    ap.add_argument("--mode", choices=("beam", "greedy"), default="beam")
    ap.add_argument("--batch-pages", type=int, default=4)
    ap.add_argument("--batch-wait-ms", type=float, default=25.0)
    args = ap.parse_args()

    smoke = os.environ.get("MANUSCRIPT_TPU_BENCH_SMOKE") == "1"
    if smoke:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        jax.config.update("jax_disable_most_optimizations", True)
        args.seconds = min(args.seconds, 4.0)
        args.clients = min(args.clients, 3)

    import jax.numpy as jnp

    # repo root on sys.path when run as `python examples/serve_bench.py`
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_page

    from manuscript_tpu import Pipeline
    from manuscript_tpu.detectors import EAST
    from manuscript_tpu.recognizers import TRBA
    from manuscript_tpu.serve import OCRServer

    target = 128 if smoke else 1280
    east = EAST(
        target_size=target,
        max_candidates=256 if smoke else 4096,
        dtype=jnp.bfloat16,
        **({"backbone": "resnet50-tiny"} if smoke else {}),
    )
    trba = TRBA(
        dtype=jnp.bfloat16, **({"cnn_stage_plan": "tiny"} if smoke else {})
    )
    pipe = Pipeline(
        detector=east,
        recognizer=trba,
        mode=args.mode,
        batch_pages=args.batch_pages,
        **({"max_words": 16} if smoke else {}),
    )
    page = build_page(0, h=256, w=192) if smoke else build_page(0)

    # random weights ⇒ calibrate the score threshold to a realistic box
    # count, exactly like bench.py (one device dispatch)
    thresh, _ = pipe._fused.calibrate(page, target_max_words=250)
    emit("serve_calibrated_thresh", thresh, "score_thresh")

    # compile+warm both the single-page and the chunked program so the
    # measurement window contains zero compiles
    pipe.predict(page)
    pipe.process_batch([page] * args.batch_pages)

    srv = OCRServer(
        pipe,
        host="127.0.0.1",
        port=0,
        batch_pages=args.batch_pages,
        batch_wait_ms=args.batch_wait_ms,
    )
    srv.start_background()
    body = encode_body(page, args.codec)
    emit("serve_request_body_bytes", len(body), "bytes", codec=args.codec)

    url = f"http://127.0.0.1:{srv.port}/ocr"
    stop_at = time.perf_counter() + args.seconds
    latencies: list = []
    errors = [0]
    lock = threading.Lock()

    def client():
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(url, data=body, method="POST")
                with urllib.request.urlopen(req, timeout=120) as resp:
                    ok = resp.status == 200 and bool(resp.read())
            except Exception:
                ok = False
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    latencies.append(dt)
                else:
                    errors[0] += 1

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start

    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/metrics", timeout=10
    ) as resp:
        metrics_text = resp.read().decode()
    srv.shutdown()

    fill = next(
        (
            float(line.split()[-1])
            for line in metrics_text.splitlines()
            if line.startswith("ocr_mean_batch_fill")
        ),
        0.0,
    )

    n = len(latencies)
    if n == 0:
        raise SystemExit(f"no successful requests ({errors[0]} errors)")
    lat = sorted(latencies)
    emit(
        "serve_pages_per_sec",
        n / elapsed,
        "pages/s",
        codec=args.codec,
        clients=args.clients,
        mode=args.mode,
        errors=errors[0],
        mean_batch_fill=round(fill, 2),
    )
    emit("serve_latency_p50_s", statistics.median(lat), "s", codec=args.codec)
    emit("serve_latency_p90_s", lat[int(0.90 * (n - 1))], "s", codec=args.codec)
    emit("serve_latency_p99_s", lat[int(0.99 * (n - 1))], "s", codec=args.codec)


if __name__ == "__main__":
    main()
