"""Persistent XLA compilation cache — one switch for every entry point.

The reference has nothing like this (all torch eager); on TPU the fused
page program, the bucketed decode programs, and the SPMD train steps each
cost tens of seconds to compile, and on this environment's tunnel the
compile service is the dominant cold-start cost (a cold full bench spends
8-10+ minutes compiling; warm, it starts measuring in seconds). JAX's
persistent compilation cache (``jax_compilation_cache_dir``) removes that
cost across process restarts — exactly what a serving deployment restarts
into.

Resolution order:

1. ``MANUSCRIPT_TPU_JAX_CACHE`` env var, if set — always wins.
2. ``default_dir`` argument, if given (bench.py passes its repo-local
   ``.jax_bench_cache``).
3. Otherwise a no-op: enabling by default is NOT safe everywhere — the
   XLA:CPU AOT loader on some hosts rejects its own cache entries over a
   machine-feature canonicalization mismatch and the process dies with
   SIGILL on load (observed on this one-core host), so CPU-only callers
   must opt in explicitly.

Used by ``bench.py``, ``__graft_entry__.py``, and the CLI
(``python -m manuscript_tpu ocr|serve|…``) so a production host sets one
env var and every entry point shares the warm cache.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compile_cache(
    default_dir: Optional[str] = None,
    *,
    min_compile_secs: float = 1.0,
    min_entry_bytes: int = 0,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at a directory.

    Returns the directory enabled, or ``None`` when no directory was
    resolved (see module docstring for the resolution order) or the JAX
    config keys are unavailable. Safe to call more than once; the last
    call wins.
    """
    cache_dir = os.environ.get("MANUSCRIPT_TPU_JAX_CACHE") or default_dir
    if not cache_dir:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", min_entry_bytes
        )
    except Exception as exc:
        # A production host that SET a cache dir but can't use it (readonly
        # dir, missing config keys on an old JAX) silently reverting to cold
        # compiles would be invisible — make it observable.
        import warnings

        warnings.warn(
            f"persistent compile cache disabled ({cache_dir}): "
            f"{type(exc).__name__}: {exc}",
            RuntimeWarning,
            stacklevel=2,
        )
        return None
    return str(cache_dir)
