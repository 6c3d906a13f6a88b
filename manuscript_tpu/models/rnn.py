"""LSTM layers as MXU-friendly scans (Flax params, explicit math).

Replaces the reference's cuDNN nn.LSTM stacks (reference:
src/manuscript/recognizers/_trba/model/model.py:9-21) with the TPU idiom:
the input projection for ALL timesteps is one large matmul (B·T, 4H) on the
MXU; only the (B, 4H) recurrent matmul rides inside ``lax.scan``. Gate order
is i, f, g, o so converted torch weights map 1:1 (torch packs
[W_i; W_f; W_g; W_o] row-blocks; bias = b_ih + b_hh folded at conversion).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def lstm_cell_step(
    kernel_hh: jnp.ndarray,  # (H, 4H)
    x_proj: jnp.ndarray,  # (B, 4H) — x @ kernel_ih + bias, precomputed
    h: jnp.ndarray,  # (B, H)
    c: jnp.ndarray,  # (B, H)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step given the precomputed input projection."""
    hidden = h.shape[-1]
    z = x_proj + h @ kernel_hh
    i = jax.nn.sigmoid(z[:, :hidden])
    f = jax.nn.sigmoid(z[:, hidden : 2 * hidden])
    g = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(z[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(
    kernel_ih: jnp.ndarray,  # (I, 4H)
    kernel_hh: jnp.ndarray,  # (H, 4H)
    bias: jnp.ndarray,  # (4H,)
    x: jnp.ndarray,  # (B, T, I)
    reverse: bool = False,
) -> jnp.ndarray:
    """Full-sequence unidirectional LSTM → (B, T, H)."""
    b, t, _ = x.shape
    hidden = kernel_hh.shape[0]
    # Compute in the input's dtype (params are stored f32; casting here is
    # what makes a bf16 encode actually run bf16 matmuls on the MXU).
    kernel_ih = kernel_ih.astype(x.dtype)
    kernel_hh = kernel_hh.astype(x.dtype)
    bias = bias.astype(x.dtype)
    # One big MXU matmul for every timestep's input projection.
    x_proj = (x.reshape(b * t, -1) @ kernel_ih + bias).reshape(b, t, -1)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) scan-major

    def step(carry, xp):
        h, c = carry
        h, c = lstm_cell_step(kernel_hh, xp, h, c)
        return (h, c), h

    init = (
        jnp.zeros((b, hidden), x.dtype),
        jnp.zeros((b, hidden), x.dtype),
    )
    _, hs = jax.lax.scan(step, init, x_proj, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


class BiLSTM(nn.Module):
    """Bidirectional LSTM + output projection, matching the reference's
    BidirectionalLSTM block (LSTM(2 dirs) → Linear(2H → out))."""

    hidden_size: int
    output_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, I) → (B, T, output_size)
        in_dim = x.shape[-1]
        h4 = 4 * self.hidden_size
        init = nn.initializers.lecun_normal()
        bias_init = nn.initializers.zeros

        k_ih_f = self.param("fwd_kernel_ih", init, (in_dim, h4))
        k_hh_f = self.param("fwd_kernel_hh", init, (self.hidden_size, h4))
        b_f = self.param("fwd_bias", bias_init, (h4,))
        k_ih_b = self.param("bwd_kernel_ih", init, (in_dim, h4))
        k_hh_b = self.param("bwd_kernel_hh", init, (self.hidden_size, h4))
        b_b = self.param("bwd_bias", bias_init, (h4,))

        x = x.astype(self.dtype)
        fwd = lstm_scan(k_ih_f, k_hh_f, b_f, x)
        bwd = lstm_scan(k_ih_b, k_hh_b, b_b, x, reverse=True)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.output_size, dtype=self.dtype, name="proj")(h)
