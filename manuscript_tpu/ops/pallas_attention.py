"""Pallas TPU kernel: fused additive-attention + LSTM decode step.

One decode step of the TRBA attention decoder chains five matmuls with
elementwise glue (score → softmax → context → gates → state update). Inside
a ``lax.scan`` XLA materializes the intermediates between fusions in HBM
every step; this kernel keeps the whole step in VMEM — one HBM read of the
operands, one write of (h', c').

Layout requirements (TPU tiling): encoder length T and hidden H must be
multiples of the lane width is not required — blocks load whole operands —
but the concatenated input width (E + V) must be padded to a multiple of
128 by the caller (``pad_step_params`` does this; zero rows in w_ih are
inert). Shapes (B ≤ a few hundred, T ≈ 32, H = 256) fit VMEM comfortably:
~6 MB total at B=64.

Used by AttentionDecoder when ``use_pallas=True`` (off by default; parity
is tested against the reference JAX step in interpret mode on CPU).

STATUS (round 4, recorded in BASELINE.md "Pallas A/B verdict"): DEMOTED to
an interpret-mode-tested reference implementation. On this environment's
experimental `axon` tunnel backend the Mosaic compile+first-run never
completed (>9.5 min, three attempts) while the XLA formulation compiled in
28.5 s — `use_pallas` stays False until a backend where Mosaic works;
`examples/pallas_bench.py` is the ready-made A/B to re-decide there.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_step_params(w_ih: jnp.ndarray, num_classes: int) -> Tuple[jnp.ndarray, int]:
    """Pad the LSTM input kernel (E+V, 4H) so the onehot block is a multiple
    of 128 wide. Returns (padded kernel, padded num_classes)."""
    e_plus_v, four_h = w_ih.shape
    e_dim = e_plus_v - num_classes
    v_pad = _round_up(num_classes, 128)
    if v_pad == num_classes:
        return w_ih, num_classes
    padded = jnp.zeros((e_dim + v_pad, four_h), w_ih.dtype)
    padded = padded.at[:e_plus_v].set(w_ih)  # [E rows; V rows; zero pad]
    return padded, v_pad


def _step_kernel(
    enc_ref,  # (B, T, E)
    proj_enc_ref,  # (B, T, H)
    h_ref,  # (B, H)
    c_ref,  # (B, H)
    onehot_ref,  # (B, Vp)
    w_h2h_ref,  # (H, H)
    b_h2h_ref,  # (1, H)
    w_score_ref,  # (H, 1) → used as (H,) row
    w_ih_ref,  # (E + Vp, 4H)
    w_hh_ref,  # (H, 4H)
    bias_ref,  # (1, 4H)
    h_out_ref,  # (B, H)
    c_out_ref,  # (B, H)
):
    f32 = jnp.float32
    h = h_ref[:]
    hidden = h.shape[-1]

    # attention scores: e[b, t] = tanh(proj_enc + W_h2h·h + b) · w_score
    proj_h = (
        jnp.dot(h, w_h2h_ref[:], preferred_element_type=f32) + b_h2h_ref[0, :]
    )  # (B, H)
    act = jnp.tanh(proj_enc_ref[:] + proj_h[:, None, :])  # (B, T, H)
    scores = jax.lax.dot_general(
        act,
        w_score_ref[:],  # (H, 1)
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    )[..., 0]  # (B, T)

    alpha = jax.nn.softmax(scores, axis=-1)  # (B, T)

    # context: ctx[b, e] = Σ_t α[b, t] · enc[b, t, e]  (batched matmul)
    ctx = jax.lax.dot_general(
        alpha[:, None, :],
        enc_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )[:, 0, :]  # (B, E)

    # LSTM gates over [ctx ; onehot] without materializing the concat:
    # split w_ih rows into the E block and the Vp block
    e_dim = ctx.shape[-1]
    z = (
        jnp.dot(ctx, w_ih_ref[:e_dim, :], preferred_element_type=f32)
        + jnp.dot(onehot_ref[:], w_ih_ref[e_dim:, :], preferred_element_type=f32)
        + jnp.dot(h, w_hh_ref[:], preferred_element_type=f32)
        + bias_ref[0, :]
    )  # (B, 4H)

    i = jax.nn.sigmoid(z[:, :hidden])
    f = jax.nn.sigmoid(z[:, hidden : 2 * hidden])
    g = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(z[:, 3 * hidden :])
    c_new = f * c_ref[:] + i * g
    h_out_ref[:] = o * jnp.tanh(c_new)
    c_out_ref[:] = c_new


@partial(jax.jit, static_argnames=("interpret",))
def attention_lstm_step_pallas(
    enc: jnp.ndarray,  # (B, T, E)
    proj_enc: jnp.ndarray,  # (B, T, H)
    h: jnp.ndarray,  # (B, H)
    c: jnp.ndarray,  # (B, H)
    onehot: jnp.ndarray,  # (B, Vp) — padded width
    w_h2h: jnp.ndarray,
    b_h2h: jnp.ndarray,
    w_score: jnp.ndarray,
    w_ih_padded: jnp.ndarray,  # (E + Vp, 4H)
    w_hh: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused attention+LSTM step → (h', c')."""
    b, hdim = h.shape
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _step_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),
        ),
        in_specs=[vmem() for _ in range(11)],
        out_specs=(vmem(), vmem()),
        interpret=interpret,
    )(
        enc,
        proj_enc,
        h,
        c,
        onehot,
        w_h2h,
        b_h2h.reshape(1, -1),
        w_score,
        w_ih_padded,
        w_hh,
        bias.reshape(1, -1),
    )
    return out
