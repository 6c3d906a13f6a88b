"""A/B benchmark: device LANMS (lax-scan program) vs host C++ LANMS.

VERDICT r1 weak #8: the device NMS path shipped dark — no recorded number
compares it against the host C++ path at realistic candidate counts. This
script measures both at 1k/4k/8k candidates ON THE CURRENT DEFAULT BACKEND
(run it plain for the TPU-over-tunnel numbers; the host path additionally
pays the candidate download, which is part of its real cost and is included
here by timing from device-resident candidates to host-usable boxes).

Usage: python examples/nms_bench.py
Prints one JSON line per (n_candidates, impl).
"""

import json
import statistics
import time

import numpy as np


def synth_candidates(n: int, seed: int = 0) -> np.ndarray:
    """Jittered word-like quads over a 1280² page: ~n/8 clusters of 8."""
    rng = np.random.default_rng(seed)
    quads = []
    n_clusters = max(1, n // 8)
    for c in range(n_clusters):
        x0 = float(rng.uniform(0, 1200))
        y0 = float(rng.uniform(0, 1240))
        w, h = float(rng.uniform(30, 120)), float(rng.uniform(12, 40))
        for _ in range(8):
            j = rng.normal(0, 1.5, 8)
            quads.append(np.concatenate([
                np.array([x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h]) + j,
                [float(rng.uniform(0.5, 1.0))],
            ]))
    return np.asarray(quads[:n], np.float32)


def timed(fn, n_iters: int = 8):
    fn()  # warmup/compile
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    import jax
    import jax.numpy as jnp

    from manuscript_tpu.ops.lanms import locality_aware_nms
    from manuscript_tpu.ops.lanms_jax import locality_aware_nms_parallel

    print(json.dumps({"backend": jax.default_backend()}))
    for n in (1024, 4096, 8192):
        cands_np = synth_candidates(n)
        cands_dev = jax.device_put(jnp.asarray(cands_np))
        jax.block_until_ready(cands_dev)

        # host path cost = candidate download + C++ merge
        def host_path():
            host = np.asarray(cands_dev)
            return locality_aware_nms(host.astype(np.float64), 0.2)

        # device path cost = on-device merge + (max_out,9) download
        def device_path():
            merged, count = locality_aware_nms_parallel(
                cands_dev, jnp.float32(0.2), max_out=1024
            )
            return np.asarray(merged), int(count)

        t_host = timed(host_path)
        t_dev = timed(device_path)
        n_host = len(host_path())
        n_dev = device_path()[1]
        print(json.dumps({
            "n_candidates": n,
            "host_cpp_ms": round(t_host * 1e3, 2),
            "device_scan_ms": round(t_dev * 1e3, 2),
            "host_boxes": int(n_host),
            "device_boxes": int(n_dev),
            "winner": "device" if t_dev < t_host else "host",
        }))


if __name__ == "__main__":
    main()
