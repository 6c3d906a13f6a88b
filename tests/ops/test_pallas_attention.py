"""Pallas fused decode-step parity vs the reference JAX cell (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manuscript_tpu.models.attention import AttentionDecoder
from manuscript_tpu.ops.pallas_attention import (

    attention_lstm_step_pallas,
    pad_step_params,
)

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    b, t, e, h, v = 4, 8, 128, 128, 100  # v deliberately non-multiple of 128
    key = jax.random.PRNGKey(0)
    dec = AttentionDecoder(enc_dim=e, hidden_size=h, num_classes=v)
    enc = jax.random.normal(key, (b, t, e)) * 0.3
    variables = dec.init(key, enc, jnp.zeros((b, 3), dtype=jnp.int32))
    return dec, variables, enc, (b, t, e, h, v)


def test_step_parity(setup):
    dec, variables, enc, (b, t, e, h, v) = setup
    p = variables["params"]
    key = jax.random.PRNGKey(1)
    h0 = jax.random.normal(key, (b, h)) * 0.5
    c0 = jax.random.normal(jax.random.fold_in(key, 1), (b, h)) * 0.5
    tok = jnp.array([1, 5, 17, 99], dtype=jnp.int32)

    # reference step via the module cell
    bound = dec.bind(variables)
    proj_enc = enc @ p["i2h_kernel"]
    onehot = jax.nn.one_hot(tok, v)
    h_ref, c_ref, _ = bound._cell(h0, c0, enc, proj_enc, onehot)

    # pallas step (interpret mode)
    w_ih_p, v_pad = pad_step_params(p["lstm_kernel_ih"], v)
    onehot_p = jax.nn.one_hot(tok, v_pad)
    h_got, c_got = attention_lstm_step_pallas(
        enc, proj_enc, h0, c0, onehot_p,
        p["h2h_kernel"], p["h2h_bias"], p["score_kernel"],
        w_ih_p, p["lstm_kernel_hh"], p["lstm_bias"],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), rtol=2e-5, atol=2e-5)


def test_greedy_decode_parity(setup):
    dec, variables, enc, (b, t, e, h, v) = setup
    logits_ref, preds_ref = dec.apply(variables, enc, max_len=6, method="greedy")

    dec_p = AttentionDecoder(
        enc_dim=e, hidden_size=h, num_classes=v,
        use_pallas=True, pallas_interpret=True,
    )
    logits_p, preds_p = dec_p.apply(variables, enc, max_len=6, method="greedy")
    np.testing.assert_array_equal(np.asarray(preds_p), np.asarray(preds_ref))
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_ref), rtol=1e-4, atol=1e-4
    )


def test_pad_step_params():
    w = jnp.ones((128 + 100, 64))
    padded, v_pad = pad_step_params(w, 100)
    assert v_pad == 128
    assert padded.shape == (128 + 128, 64)
    np.testing.assert_array_equal(np.asarray(padded[228:]), 0.0)


def test_beam_decode_parity(setup):
    dec, variables, enc, (b, t, e, h, v) = setup
    logits_ref, tokens_ref = dec.apply(
        variables, enc, max_len=6, beam_size=3, method="beam"
    )
    dec_p = AttentionDecoder(
        enc_dim=e, hidden_size=h, num_classes=v,
        use_pallas=True, pallas_interpret=True,
    )
    logits_p, tokens_p = dec_p.apply(
        variables, enc, max_len=6, beam_size=3, method="beam"
    )
    np.testing.assert_array_equal(np.asarray(tokens_p), np.asarray(tokens_ref))
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_ref), rtol=1e-4, atol=1e-4
    )
