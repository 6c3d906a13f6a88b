"""Shape/semantics tests for the Flax models (tiny inputs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manuscript_tpu.models import (
    AttentionDecoder,
    EASTModel,
    SEResNet31,
    TRBAModel,
)
from manuscript_tpu.models.rnn import BiLSTM, lstm_scan

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestEAST:
    def test_output_shapes_quarter_res(self, key):
        model = EASTModel(backbone="resnet50")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(key, x)
        out = model.apply(variables, x)
        assert out["score"].shape == (1, 16, 16, 1)
        assert out["geometry"].shape == (1, 16, 16, 8)
        s = np.asarray(out["score"])
        assert s.min() >= 0.0 and s.max() <= 1.0

    def test_resnet101_builds(self, key):
        model = EASTModel(backbone="resnet101")
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(key, x)
        out = model.apply(variables, x)
        assert out["score"].shape == (1, 8, 8, 1)

    def test_batch_stats_collection_exists(self, key):
        model = EASTModel()
        variables = model.init(key, jnp.zeros((1, 32, 32, 3)))
        assert "batch_stats" in variables


class TestLSTM:
    def test_lstm_scan_shapes(self, key):
        b, t, i, h = 2, 5, 3, 4
        k1, k2 = jax.random.split(key)
        kih = jax.random.normal(k1, (i, 4 * h)) * 0.1
        khh = jax.random.normal(k2, (h, 4 * h)) * 0.1
        bias = jnp.zeros((4 * h,))
        x = jax.random.normal(key, (b, t, i))
        out = lstm_scan(kih, khh, bias, x)
        assert out.shape == (b, t, h)

    def test_reverse_is_time_mirrored(self, key):
        # reversing input AND reverse-scan must agree step-for-step
        b, t, i, h = 1, 6, 3, 4
        kih = jax.random.normal(key, (i, 4 * h)) * 0.1
        khh = jax.random.normal(key, (h, 4 * h)) * 0.1
        bias = jnp.zeros((4 * h,))
        x = jax.random.normal(key, (b, t, i))
        bwd = lstm_scan(kih, khh, bias, x, reverse=True)
        fwd_of_flipped = lstm_scan(kih, khh, bias, x[:, ::-1])
        np.testing.assert_allclose(
            np.asarray(bwd), np.asarray(fwd_of_flipped[:, ::-1]), rtol=1e-5, atol=1e-6
        )

    def test_bilstm_output(self, key):
        m = BiLSTM(hidden_size=8, output_size=8)
        x = jnp.zeros((2, 7, 5))
        variables = m.init(key, x)
        out = m.apply(variables, x)
        assert out.shape == (2, 7, 8)


class TestSEResNet31:
    def test_shapes_64x256(self, key):
        m = SEResNet31()
        x = jnp.zeros((1, 64, 256, 3))
        variables = m.init(key, x)
        out = m.apply(variables, x)
        # H: 64→32→16→16→8→8→4(out_conv1)→3(out_conv2); W: 256→128→64→32→33→32
        assert out.shape == (1, 3, 32, 512)


class TestAttentionDecoder:
    def _make(self, key, b=2, t=7, e=16, h=16, v=12):
        dec = AttentionDecoder(enc_dim=e, hidden_size=h, num_classes=v)
        enc = jax.random.normal(key, (b, t, e)) * 0.5
        text_in = jnp.zeros((b, 5), dtype=jnp.int32)
        variables = dec.init(key, enc, text_in)
        return dec, variables, enc

    def test_teacher_forced_shape(self, key):
        dec, variables, enc = self._make(key)
        text_in = jnp.ones((2, 5), dtype=jnp.int32)
        logits = dec.apply(variables, enc, text_in)
        assert logits.shape == (2, 5, 12)

    def test_greedy_shapes(self, key):
        dec, variables, enc = self._make(key)
        logits, preds = dec.apply(variables, enc, max_len=9, method="greedy")
        assert logits.shape == (2, 10, 12)
        assert preds.shape == (2, 10)
        # preds are argmax of logits
        np.testing.assert_array_equal(
            np.asarray(preds), np.asarray(jnp.argmax(logits, -1))
        )

    def test_beam_shapes(self, key):
        dec, variables, enc = self._make(key)
        logits, tokens = dec.apply(
            variables, enc, max_len=9, beam_size=3, method="beam"
        )
        assert logits.shape == (2, 9, 12)
        assert tokens.shape == (2, 9)

    def test_beam_width_1_matches_greedy_tokens(self, key):
        # beam=1, no length penalty, T=1 must reproduce greedy choices
        dec, variables, enc = self._make(key)
        g_logits, g_preds = dec.apply(variables, enc, max_len=9, method="greedy")
        b_logits, b_tokens = dec.apply(
            variables,
            enc,
            max_len=9,
            beam_size=1,
            alpha=0.0,
            temperature=1.0,
            method="beam",
        )
        # tokens must agree up to and including the first EOS (=2 here);
        # after EOS beam pins finished beams to EOS while greedy free-runs
        g = np.asarray(g_preds[:, :9])
        bt = np.asarray(b_tokens)
        for row_g, row_b in zip(g, bt):
            eos_positions = np.where(row_b == 2)[0]
            upto = (eos_positions[0] + 1) if len(eos_positions) else len(row_b)
            np.testing.assert_array_equal(row_g[:upto], row_b[:upto])

    def test_blank_masking(self, key):
        dec = AttentionDecoder(enc_dim=8, hidden_size=8, num_classes=10, blank_id=3)
        enc = jax.random.normal(key, (1, 4, 8))
        text_in = jnp.zeros((1, 3), dtype=jnp.int32)
        variables = dec.init(key, enc, text_in)
        logits = dec.apply(variables, enc, text_in)
        assert np.all(np.asarray(logits[..., 3]) == -1e4)


class TestTRBA:
    def test_full_model(self, key):
        m = TRBAModel(num_classes=12, hidden_size=16)
        x = jnp.zeros((2, 32, 64, 3))
        text_in = jnp.zeros((2, 6), dtype=jnp.int32)
        variables = m.init(key, x, text_in)
        logits = m.apply(variables, x, text_in)
        assert logits.shape == (2, 6, 12)

        g_logits, g_preds = m.apply(variables, x, max_len=5, method="greedy")
        assert g_logits.shape == (2, 6, 12)
        b_logits, b_tokens = m.apply(
            variables, x, max_len=5, beam_size=2, method="beam"
        )
        assert b_tokens.shape == (2, 5)
