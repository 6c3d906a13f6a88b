"""On-chip per-stage breakdown of the EAST forward (1280², bf16).

Exploits XLA dead-code elimination to get prefix programs for free: a
program that consumes only ``res_k`` compiles exactly the backbone up to
stage k, so consecutive differences isolate each stage, and full-model
minus full-backbone isolates the merge decoder + head. Uses the same
differential-chain timing as examples/fused_profile.py (this tunnel's
``block_until_ready`` is unreliable — BASELINE.md round-2 methodology).

Context: after the space-to-depth stem fold the EAST forward is 4.34 ms
but still ~0.2 MFU vs the TRBA CNN's ~0.5 — this probe locates the
remaining cost. Smoke mode (MANUSCRIPT_TPU_BENCH_SMOKE=1): tiny CPU run.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")

SMOKE = os.environ.get("MANUSCRIPT_TPU_BENCH_SMOKE") == "1"
if SMOKE:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    jax.config.update("jax_disable_most_optimizations", True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _enable_compile_cache

    _enable_compile_cache()

    from manuscript_tpu.models.east import EASTModel
    from manuscript_tpu.models.resnet import ResNetFeatures

    size = 128 if SMOKE else 1280
    backbone = "resnet50-tiny" if SMOKE else "resnet50"
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((size, size, 3), dtype=np.float32), dtype)

    model = EASTModel(backbone=backbone, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), x[None])
    bb = ResNetFeatures(backbone=backbone, dtype=dtype)
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }

    from _timing import chain_time, chained

    def prefix(stage):
        def fn(eps):
            feats = bb.apply(bb_vars, (x + eps.astype(dtype))[None])
            return feats[stage].astype(jnp.float32).sum()

        return fn

    def full(eps):
        out = model.apply(variables, (x + eps.astype(dtype))[None])
        return out["score"].astype(jnp.float32).sum() + out["geometry"].astype(
            jnp.float32
        ).sum()

    n_lo, n_hi, reps = (1, 2, 2) if SMOKE else (4, 24, 5)
    times = {}
    for name, fn in [
        ("res1", prefix("res1")),
        ("res2", prefix("res2")),
        ("res3", prefix("res3")),
        ("res4", prefix("res4")),
        ("full", full),
    ]:
        t = chain_time(chained(fn), n_lo, n_hi, reps)
        times[name] = t
        print(json.dumps({"program": f"east_prefix_{name}", "ms": round(t * 1e3, 4)}), flush=True)

    stages = {
        "stem+layer1 (res1, 320^2x256)": times["res1"],
        "layer2 (res2, 160^2x512)": times["res2"] - times["res1"],
        "layer3 (res3, 80^2x1024)": times["res3"] - times["res2"],
        "layer4 (res4, 40^2x2048)": times["res4"] - times["res3"],
        "decoder+head": times["full"] - times["res4"],
    }
    for k, v in stages.items():
        print(json.dumps({"stage": k, "ms": round(v * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
