"""Unit tests for VERDICT r1 fixes: tail-batch padding (weak #4), scheduled
sampling (missing #4), and EMA consumption (missing #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manuscript_tpu.train.east_train import pad_to_multiple

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


class TestPadToMultiple:
    def test_tail_smaller_than_pad(self):
        # 3-row tail batch on an 8-device mesh: pad=5 > n=3 must wrap
        arrays = {
            "image": np.arange(3 * 4).reshape(3, 4).astype(np.float32),
            "score": np.arange(3).astype(np.float32),
        }
        out = pad_to_multiple(arrays, 8)
        assert out["image"].shape[0] == 8
        assert out["score"].shape[0] == 8
        np.testing.assert_array_equal(
            out["score"], [0, 1, 2, 0, 1, 2, 0, 1]
        )

    def test_already_divisible_is_identity(self):
        arrays = {"x": np.ones((8, 2), np.float32)}
        out = pad_to_multiple(arrays, 4)
        assert out["x"].shape[0] == 8

    def test_simple_pad(self):
        arrays = {"x": np.arange(6).astype(np.float32)}
        out = pad_to_multiple(arrays, 4)
        np.testing.assert_array_equal(out["x"], [0, 1, 2, 3, 4, 5, 0, 1])


class TestScheduledSampling:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from manuscript_tpu.models.trba import TRBAModel

        model = TRBAModel(num_classes=8, hidden_size=16, dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 32, 32, 3), jnp.float32),
            jnp.zeros((2, 5), jnp.int32),
        )
        return model, variables

    def _forward(self, model, variables, ss_prob):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        text_in = jnp.array([[1, 3, 4, 5, 2], [1, 6, 7, 3, 2]], jnp.int32)
        return model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x,
            text_in,
            train=True,
            ss_prob=ss_prob,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)},
        )[0]

    def test_ss_changes_logits(self, model_and_vars):
        model, variables = model_and_vars
        base = self._forward(model, variables, 0.0)
        sampled = self._forward(model, variables, 1.0)
        assert base.shape == sampled.shape
        # with prob 1.0 every step after the first feeds the model's own
        # prediction — random-init predictions differ from GT tokens, so the
        # downstream logits must differ
        assert not np.allclose(np.asarray(base), np.asarray(sampled))

    def test_ss_zero_is_pure_teacher_forcing(self, model_and_vars):
        model, variables = model_and_vars
        a = self._forward(model, variables, 0.0)
        b = self._forward(model, variables, 0.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_first_step_never_sampled(self, model_and_vars):
        # position 0 consumes SOS; with ss_prob=1.0 the step-0 logits must
        # match teacher forcing exactly (nothing to sample from yet)
        model, variables = model_and_vars
        base = self._forward(model, variables, 0.0)
        sampled = self._forward(model, variables, 1.0)
        np.testing.assert_allclose(
            np.asarray(base[:, 0]), np.asarray(sampled[:, 0]), rtol=1e-5
        )
