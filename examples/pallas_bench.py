"""A/B: Pallas kernels vs their XLA formulations on the current backend.

VERDICT r2 noted that both Pallas kernels (ops/pallas_iou.py,
ops/pallas_attention.py) shipped without a recorded number showing whether
they beat the XLA path. This script records that number honestly on
whatever backend is active (run plain for the TPU-over-tunnel measurement;
results land in one JSON line per config).

Timing methodology (BASELINE.md round-2 link characterization): on the
axon tunnel ``jax.block_until_ready`` does not reliably fence, so each
measurement jits a serial CHAIN of n kernel applications — iteration i+1's
input depends on a scalar of iteration i's output, so nothing is
dead-code-eliminated or overlapped — and fetches one scalar at the end.
Per-iteration time is the differential (t(n_hi) - t(n_lo)) / (n_hi - n_lo),
which cancels dispatch + d2h + the chain's fixed overhead. Median of 5.
"""

import json
import os
import statistics
import time

import numpy as np


def synth_quads(m: int, seed: int = 0) -> np.ndarray:
    """Word-like convex quads over a 1280² page, (M, 4, 2) f32."""
    rng = np.random.default_rng(seed)
    out = np.empty((m, 4, 2), np.float32)
    for i in range(m):
        x0, y0 = rng.uniform(0, 1200), rng.uniform(0, 1240)
        w, h = rng.uniform(30, 120), rng.uniform(12, 40)
        quad = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]],
            np.float32,
        )
        out[i] = quad + rng.normal(0, 1.0, (4, 2)).astype(np.float32)
    return out


def chain_time(run, n_lo: int, n_hi: int, repeats: int = 5) -> float:
    """Median per-iteration seconds via the differential chain method."""
    float(run(n_lo))  # compile both chain lengths before timing
    float(run(n_hi))
    per_iter = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(n_hi))
        t_hi = time.perf_counter() - t0
        per_iter.append((t_hi - t_lo) / (n_hi - n_lo))
    return statistics.median(per_iter)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from manuscript_tpu.ops.lanms_jax import quad_iou_matrix
    from manuscript_tpu.ops.pallas_iou import pallas_quad_iou_matrix

    if os.environ.get("MANUSCRIPT_TPU_BENCH_SMOKE") == "1":
        # the axon TPU registration beats JAX_PLATFORMS=cpu on this host;
        # jax.config is the reliable override (same as bench.py smoke mode)
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    backend = jax.default_backend()
    interpret = backend != "tpu"  # CPU smoke runs use interpret mode
    print(json.dumps({"backend": backend, "pallas_interpret": interpret}))

    results = []

    # ---- pairwise quad-IoU matrix (the device-NMS hot op) ----
    from functools import partial

    def iou_chain(kernel):
        @partial(jax.jit, static_argnums=2)
        def run(a, b, n):
            def body(carry, _):
                m = kernel(a + carry, b)
                return m[0, 0] * jnp.float32(1e-12), ()

            s, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return s

        return run

    # interpret-mode pallas (CPU smoke) is a Python-level simulator —
    # keep it to one small tile config; real sizes run on the TPU backend
    for m in ((64,) if interpret else (256, 1024)):
        a = jnp.asarray(synth_quads(m))
        n_lo, n_hi = (1, 3) if interpret else (2, 10)

        xla_run = iou_chain(lambda x, y: quad_iou_matrix(x, y))
        t_xla = chain_time(lambda n: xla_run(a, a, n), n_lo, n_hi)

        # interpret mode relaxes the (8, 128)-divisible block rule; the
        # compiled TPU kernel needs the default tn=128 tiles
        tm, tn = (32, 32) if interpret else (32, 128)
        pl_kernel = lambda x, y: pallas_quad_iou_matrix(  # noqa: E731
            x, y, tm=tm, tn=tn, interpret=interpret
        )
        pl_run = iou_chain(pl_kernel)
        t_pl = chain_time(lambda n: pl_run(a, a, n), n_lo, n_hi)

        line = {
            "kernel": "quad_iou_matrix",
            "m": m,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "pallas_speedup": round(t_xla / t_pl, 3),
        }
        print(json.dumps(line), flush=True)
        results.append(line)

    # ---- fused attention-LSTM greedy decode (26-step scan) ----
    from manuscript_tpu.recognizers import TRBA

    for use_pallas, tag in ((False, "xla"), (True, "pallas")):
        if not _trba_supports(use_pallas, interpret):
            continue
        trba = TRBA(dtype=jnp.bfloat16, use_pallas=use_pallas)
        model, variables = trba.model, trba.variables
        b = 8 if interpret else 64
        x = jnp.asarray(
            np.random.default_rng(1)
            .integers(0, 255, (b, trba.img_h, trba.img_w, 3))
            .astype(np.float32)
            / 255.0,
            jnp.bfloat16,
        )

        from functools import partial as _partial

        @_partial(jax.jit, static_argnums=1)
        def run(x0, n):
            def body(carry, _):
                logits, _preds = model.apply(
                    variables, x0 + carry, max_len=25, method="greedy"
                )
                # nonzero factor: a *0 fold would let XLA break the chain
                return logits[0, 0, 0].astype(jnp.bfloat16) * 1e-8, ()

            s, _ = lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return s

        n_lo, n_hi = (1, 2) if interpret else (1, 4)
        t = chain_time(lambda n: run(x, n), n_lo, n_hi, repeats=3)
        line = {
            "kernel": f"trba_greedy_{tag}",
            "batch": b,
            "ms_per_decode": round(t * 1e3, 2),
        }
        print(json.dumps(line), flush=True)
        results.append(line)

    return results


def _trba_supports(use_pallas: bool, interpret: bool) -> bool:
    if not use_pallas:
        return True
    # interpret-mode pallas greedy is covered by tests; the wrapper only
    # exposes use_pallas (compiled mode) — skip on non-TPU backends.
    return not interpret


if __name__ == "__main__":
    import os

    os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
    os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
