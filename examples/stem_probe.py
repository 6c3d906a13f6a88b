"""On-chip probe: EAST's ResNet stem conv (7x7/2 on a 3-channel 1280^2
page) vs a space-to-depth equivalent (4x4/1 on 640^2x12).

The fused-page stage profile (BASELINE.md round 4) shows EAST forward at
~6.5 ms = 31% of the page while running at only ~23% of bf16 peak (the
TRBA CNN by contrast sits at roofline). The classic TPU suspect is the
stem: a C_in=3 conv cannot feed the MXU's 128-lane contraction. The
space-to-depth transform (MLPerf ResNet lore) rewrites
    y = conv7x7_s2_p3(x)                      # 1280x1280x3 -> 640x640x64
as
    y = conv4x4_s1_p(2,1)(s2d_2x2(x))         # 640x640x12  -> 640x640x64
with the 7x7 kernel zero-padded to 8x8 (one extra row/col at the TOP/LEFT
— padding 3 with stride 2 means tap u covers offset 2i-3+u; in the padded
indexing u' in 0..7 the offset is 2(i-2+c)+a for u'=2c+a) and folded
2x2-spatial-into-channels to match the input blocks. Numerically exact
(same MACs + 45 zero taps), 4x the contraction depth.

Prints one JSON line per timed program (differential-chain method, see
examples/fused_profile.py docstring) plus a numerical-equivalence check.
Smoke mode (MANUSCRIPT_TPU_BENCH_SMOKE=1): tiny shapes on CPU.
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
    # on this host the axon platform registration beats JAX_PLATFORMS=cpu;
    # force via jax.config like bench.py does, and compile at opt-0
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    jax.config.update("jax_disable_most_optimizations", True)


def s2d(x, b=2):
    """NHWC space-to-depth: (H, W, C) -> (H/b, W/b, C*b*b); channel order
    (a, b, c) = (row-in-block, col-in-block, channel), matching the kernel
    fold in `fold_kernel`."""
    h, w, c = x.shape
    x = x.reshape(h // b, b, w // b, b, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(h // b, w // b, b * b * c)


def fold_kernel(k, b=2):
    """(7,7,3,64) HWIO -> zero-pad to (8,8) at top/left -> (4,4,12,64)."""
    import jax.numpy as jnp

    k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kh, kw, ci, co = k8.shape
    k8 = k8.reshape(kh // b, b, kw // b, b, ci, co)
    return k8.transpose(0, 2, 1, 3, 4, 5).reshape(kh // b, kw // b, b * b * ci, co)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _enable_compile_cache

    _enable_compile_cache()

    size = 128 if SMOKE else 1280
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((size, size, 3), dtype=np.float32)
    k_host = (rng.standard_normal((7, 7, 3, 64), dtype=np.float32) * 0.05)

    x = jnp.asarray(x_host, dtype)
    k = jnp.asarray(k_host, dtype)
    x2 = jnp.asarray(s2d(x_host), dtype)
    k2 = fold_kernel(jnp.asarray(k_host, dtype))

    dn = ("NHWC", "HWIO", "NHWC")

    def conv_orig(x, k, eps):
        x = x + eps.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x[None], k, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
        )
        return y.astype(jnp.float32).sum()

    def conv_s2d(x2, k2, eps):
        x2 = x2 + eps.astype(x2.dtype)
        y = jax.lax.conv_general_dilated(
            x2[None], k2, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn
        )
        return y.astype(jnp.float32).sum()

    # numerical equivalence (f32 on host shapes to avoid bf16 noise)
    xf, kf = jnp.asarray(x_host), jnp.asarray(k_host)
    y_a = jax.lax.conv_general_dilated(
        xf[None], kf, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
    )
    y_b = jax.lax.conv_general_dilated(
        jnp.asarray(s2d(x_host))[None], fold_kernel(kf), (1, 1),
        [(2, 1), (2, 1)], dimension_numbers=dn,
    )
    err = float(jnp.abs(y_a - y_b).max() / (jnp.abs(y_a).max() + 1e-9))
    print(json.dumps({"check": "s2d_equivalence", "rel_err": err}), flush=True)
    assert err < 1e-5, err

    from _timing import chain_time, chained

    n_lo, n_hi = (1, 2) if SMOKE else (4, 32)
    for name, fn, args in [
        ("stem_conv_7x7s2", conv_orig, (x, k)),
        ("stem_conv_s2d_4x4s1", conv_s2d, (x2, k2)),
    ]:
        t = chain_time(chained(fn, *args), n_lo, n_hi, repeats=3 if SMOKE else 5)
        print(
            json.dumps({"program": name, "ms": round(t * 1e3, 4)}), flush=True
        )

    # full EAST forward for context (same chain method)
    from manuscript_tpu.detectors import EAST

    east = EAST(
        dtype=jnp.bfloat16,
        target_size=size,
        **({"backbone": "resnet50-tiny"} if SMOKE else {}),
    )
    ev = east.variables

    def east_fwd(ev, x, eps):
        out = east.model.apply(ev, (x + eps.astype(x.dtype))[None])
        return out["score"].astype(jnp.float32).sum() + out["geometry"].astype(
            jnp.float32
        ).sum()

    t = chain_time(
        chained(east_fwd, ev, x), n_lo, max(n_hi // 4, n_lo + 1),
        repeats=3 if SMOKE else 5,
    )
    print(json.dumps({"program": "east_forward_full", "ms": round(t * 1e3, 4)}))


if __name__ == "__main__":
    main()
