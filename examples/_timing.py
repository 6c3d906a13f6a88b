"""Shared differential-chain timing helpers for the on-chip probes.

The tunnel's ``block_until_ready`` is unreliable (BASELINE.md round-2
methodology), so every probe times a jitted ``fori_loop`` chain of n
dispatches whose scalar result data-depends on each iteration, and takes
the difference between a long and a short chain. The loop bound is a
TRACED argument, so one compile covers both chain lengths (the tunnel's
remote-compile service is the real budget).

Used by examples/stem_probe.py, examples/east_stage_probe.py and
examples/fused_profile.py; examples/pallas_bench.py pioneered the scheme.
"""

import statistics
import time

import jax
import jax.numpy as jnp


def chained(fn, *const_args):
    """Jitted n-iteration chain of ``fn(*const_args, carry)``: each step's
    input data-depends on the previous output (scaled to ~0 so magnitudes
    stay finite), forcing the device to execute all n dispatches."""

    def run(n):
        def body(_, carry):
            return fn(*const_args, carry * jnp.float32(1e-30)) * jnp.float32(
                1e-20
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return jax.jit(run)


def chain_time(run, n_lo: int, n_hi: int, repeats: int = 5) -> float:
    """Median per-iteration seconds via the differential chain method:
    (t(n_hi) − t(n_lo)) / (n_hi − n_lo) cancels the fixed dispatch+fetch
    overhead shared by both chain lengths."""
    float(run(n_lo))  # compile (traced bound: one program for both lengths)
    float(run(n_hi))  # warm the long chain too
    per_iter = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(n_hi))
        t1 = time.perf_counter()
        float(run(n_lo))
        t2 = time.perf_counter()
        per_iter.append(((t1 - t0) - (t2 - t1)) / (n_hi - n_lo))
    return statistics.median(per_iter)
