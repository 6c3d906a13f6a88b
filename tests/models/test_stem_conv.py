"""Space-to-depth stem conv (models/resnet.StemConv) equivalence tests.

The folded 4×4/1 form must be numerically identical (up to accumulation
order) to the direct 7×7/2 conv it replaces, for even and odd spatial
dims, and must keep the exact (7,7,C_in,width) HWIO parameter layout so
checkpoints and torch conversion are unaffected.
"""

import jax
import jax.numpy as jnp
import numpy as np

from manuscript_tpu.models.resnet import ResNetFeatures, StemConv


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestStemConv:
    def test_matches_direct_conv_even_dims(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)), jnp.float32)
        m = StemConv(width=8)
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        y_ref = _direct(x, variables["params"]["kernel"])
        assert y.shape == y_ref.shape == (2, 8, 12, 8)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
        )

    def test_odd_dims_fall_back(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 15, 17, 3)), jnp.float32)
        m = StemConv(width=4)
        variables = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(variables, x)
        y_ref = _direct(x, variables["params"]["kernel"])
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
        )

    def test_param_tree_layout_unchanged(self):
        m = ResNetFeatures(backbone="resnet50-micro")
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        k = variables["params"]["conv1"]["kernel"]
        assert k.shape == (7, 7, 3, 16)  # HWIO, micro stem width

    def test_gradients_flow_to_canonical_kernel(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
        m = StemConv(width=4)
        variables = m.init(jax.random.PRNGKey(2), x)

        def loss(params):
            return m.apply({"params": params}, x).sum()

        g = jax.grad(loss)(variables["params"])
        assert g["kernel"].shape == (7, 7, 3, 4)
        assert float(jnp.abs(g["kernel"]).sum()) > 0.0
