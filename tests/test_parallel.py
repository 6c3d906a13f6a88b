"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from manuscript_tpu.parallel import (

    DATA_AXIS,
    canonicalize_layout,
    data_sharding,
    initialize_distributed,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


class TestMesh:
    def test_full_mesh(self):
        mesh = make_mesh()
        assert mesh.shape[DATA_AXIS] == 8
        assert mesh.shape["model"] == 1

    def test_subset(self):
        mesh = make_mesh(n_devices=4)
        assert mesh.shape[DATA_AXIS] == 4

    def test_model_axis(self):
        mesh = make_mesh(n_devices=8, model_parallel=2)
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape["model"] == 2

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(n_devices=6, model_parallel=4)


class TestSharding:
    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh()
        batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.spec == P(DATA_AXIS, None)
        assert sharded["y"].sharding.spec == P(DATA_AXIS)
        # each device holds 2 rows
        assert sharded["x"].addressable_shards[0].data.shape == (2, 4)

    def test_replicated_params(self):
        mesh = make_mesh()
        params = {"w": np.ones((4, 4), np.float32)}
        rep = replicate(params, mesh)
        assert rep["w"].sharding.spec == P()
        assert len(rep["w"].addressable_shards) == 8

    def test_spmd_gradient_allreduce(self):
        """Data-sharded loss gradient must equal the full-batch gradient."""
        mesh = make_mesh()
        w = replicate({"w": jnp.ones((4,))}, mesh)
        x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
        y = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)

        def loss(w, x, y):
            return jnp.mean((x @ w["w"] - y) ** 2)

        sharded = shard_batch({"x": x, "y": y}, mesh)
        g_spmd = jax.jit(jax.grad(loss))(w, sharded["x"], sharded["y"])
        g_ref = jax.grad(loss)({"w": jnp.ones((4,))}, x, y)
        np.testing.assert_allclose(
            np.asarray(g_spmd["w"]), np.asarray(g_ref["w"]), rtol=1e-5
        )

    def test_pad_to_multiple(self):
        arr = np.ones((5, 3))
        padded, n = pad_to_multiple(arr, 8)
        assert padded.shape == (8, 3)
        assert n == 5
        padded2, n2 = pad_to_multiple(np.ones((8, 3)), 8)
        assert padded2.shape == (8, 3) and n2 == 8

    def test_canonicalize_layout_identity(self):
        tree = {"a": np.arange(12.0).reshape(3, 4)}
        out = canonicalize_layout(tree)
        np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])

    def test_initialize_distributed_noop(self):
        initialize_distributed()  # single-host: must not raise
