"""On-chip probe: does int8 convolution beat bf16 on this backend?

TPU v5e's MXU runs int8 matmul at 2x the bf16 rate (394 vs 197 TOPS peak).
The fused page program is dominated by two CNNs at their bf16 rooflines
(BASELINE.md round-4 stage profile: TRBA SEResNet31 10.2 ms = 48%, EAST
forward 4.3 ms post-stem-fold), so a working int8 conv path is the one
remaining device-side lever. This probe times representative conv shapes
from both CNNs in bf16 vs int8 (weights+activations int8, accumulate
int32) to decide whether a quantized inference mode is worth building.

Methodology: same as examples/stem_probe.py — the tunnel's
block_until_ready is unreliable, so every timing chains n dispatches and
fetches a scalar that data-depends on the last output.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x, n=20):
    out = fn(x)
    jnp.asarray(out).block_until_ready()
    s = jax.jit(lambda t: t.astype(jnp.float32).sum())
    float(np.asarray(s(out)))  # warm the fence program
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out) if out.shape == x.shape and out.dtype == x.dtype else fn(x)
    float(np.asarray(s(out)))
    return (time.perf_counter() - t0) / n


def conv(x, w, stride=1, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def probe_shape(name, n, h, w, cin, cout, k, stride=1, iters=20):
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8)

    f_bf16 = jax.jit(lambda x: conv(x, wf, stride))
    # int8 in, int32 accumulate — the MXU's quantized path
    f_int8 = jax.jit(lambda x: conv(x, wi, stride, preferred=jnp.int32))

    t_bf = chain_time(f_bf16, xf, iters)
    try:
        t_i8 = chain_time(f_int8, xi, iters)
        speedup = t_bf / t_i8
    except Exception as exc:  # backend may not lower int8 convs
        print(f"{name}: bf16 {t_bf*1e3:.3f} ms, int8 FAILED: {exc!r}")
        return
    flops = 2 * n * (h // stride) * (w // stride) * cin * cout * k * k
    print(
        f"{name}: bf16 {t_bf*1e3:.3f} ms ({flops/t_bf/1e12:.1f} TF/s), "
        f"int8 {t_i8*1e3:.3f} ms ({flops/t_i8/1e12:.1f} Tops/s), "
        f"speedup {speedup:.2f}x"
    )


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    # TRBA SEResNet31 hot shapes (64 crops of 64x256 through the stages)
    probe_shape("trba_stage1 3x3 64x256x128->256 s2", 64, 64, 256, 128, 256, 3, 2)
    probe_shape("trba_stage2 3x3 32x128x256", 64, 32, 128, 256, 256, 3, 1)
    probe_shape("trba_stage3 3x3 16x64x512", 64, 16, 64, 256, 512, 3, 2)
    probe_shape("trba_stage3b 3x3 16x64x512", 64, 16, 64, 512, 512, 3, 1)
    # EAST resnet50 hot shapes (1280^2 page -> 320^2 layer1)
    probe_shape("east_layer1 1x1 320^2 64->256", 1, 320, 320, 64, 256, 1)
    probe_shape("east_layer1 3x3 320^2 64->64", 1, 320, 320, 64, 64, 3)
    probe_shape("east_layer3 3x3 80^2 256->256", 1, 80, 80, 256, 256, 3)
    # pure matmul control (MXU-shaped)
    rng = np.random.default_rng(1)
    a_bf = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.integers(-127, 127, (4096, 4096)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (4096, 4096)), jnp.int8)
    mm_bf = jax.jit(lambda x: x @ b_bf)
    mm_i8 = jax.jit(
        lambda x: jax.lax.dot(x, b_i8, preferred_element_type=jnp.int32)
    )
    t_bf = chain_time(mm_bf, a_bf)
    flops = 2 * 4096**3
    print(f"matmul4096 bf16: {t_bf*1e3:.3f} ms ({flops/t_bf/1e12:.1f} TF/s)")
    try:
        t_i8 = chain_time(mm_i8, a_i8)
        print(
            f"matmul4096 int8: {t_i8*1e3:.3f} ms ({flops/t_i8/1e12:.1f} "
            f"Tops/s), speedup {t_bf/t_i8:.2f}x"
        )
    except Exception as exc:
        print(f"matmul4096 int8 FAILED: {exc!r}")


if __name__ == "__main__":
    main()
