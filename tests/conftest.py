"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths run everywhere (SURVEY.md §4 — the mesh tests the reference never had).

The container pins JAX_PLATFORMS=axon (real TPU) via sitecustomize, and that
registration wins over the env var — jax.config is the reliable override.
Must run before any test module touches jax arrays.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# Low-core hosts timeslice the 8 SPMD partitions over one core; slow
# participants reach collective rendezvous late and the default 40s
# terminate timeout kills the process mid all-reduce.
if "collective_call_terminate" not in _flags:
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
# Skip the expensive LLVM middle-end passes (compile-time-only knob; HLO
# passes untouched, numerics unchanged — dryrun losses bit-identical).
# A/B r3: TRBA SPMD step compile 215s → 143s on one core. NOTE: in the
# DEFAULT test tier this flag is redundant — jax_disable_most_optimizations
# below already sets the same debug option — it only takes effect under
# MANUSCRIPT_TPU_TEST_FULL_OPT=1 (and in the dryrun, which runs at full opt).
if "llvm_disable_expensive_passes" not in _flags:
    _flags += " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = _flags.strip()

# Tests run weight-free: no network fetch attempts, and wrappers may fall
# back to random init (the strict default would make EAST()/TRBA() raise).
os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests validate semantics, not kernel speed: skip XLA's expensive
# optimization passes so the compile-heavy device-path tests fit the
# default tier on a one-core host (measured: full default selection
# 8 min → ~6.5 min; the tiny fused pipeline 47 s → 18 s). The flag
# lowers the backend optimization level only — no fast-math, numerics
# unchanged (dryrun losses bit-identical either way). Opt out with
# MANUSCRIPT_TPU_TEST_FULL_OPT=1 to compile tests at full opt level.
if os.environ.get("MANUSCRIPT_TPU_TEST_FULL_OPT") != "1":
    jax.config.update("jax_disable_most_optimizations", True)
# NOTE: no persistent compile cache — the XLA:CPU AOT loader on this host
# rejects its own cache entries (machine-feature canonicalization mismatch)
# and can SIGILL on load. Opt in via MANUSCRIPT_TPU_JAX_CACHE if known-good.
_cache = os.environ.get("MANUSCRIPT_TPU_JAX_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
