"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

from pathlib import Path

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


class TestFullModelSPMD:
    def test_trba_train_step_8dev(self):
        """Full TRBA train step (CNN→BiLSTM→attention, teacher-forced CE,
        Adam) on the 8-device mesh: batch sharded on 'data', params
        replicated, XLA inserting the gradient all-reduce. tiny stage plan
        keeps the one-core compile inside the slow-tier budget; the 8-wide
        EAST SAM variant runs in __graft_entry__.dryrun_multichip."""
        import optax

        from manuscript_tpu.models.trba import TRBAModel
        from manuscript_tpu.train.trba_train import make_train_step

        mesh = make_mesh(n_devices=8)
        model = TRBAModel(
            num_classes=12, hidden_size=8, dtype=jnp.float32,
            cnn_stage_plan="tiny",
        )
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            tv = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 32, 3), jnp.float32),
                jnp.zeros((1, 3), jnp.int32),
            )
        tx = optax.adam(1e-3)
        params = replicate(tv["params"], mesh)
        bs = replicate(tv["batch_stats"], mesh)
        opt = replicate(tx.init(tv["params"]), mesh)
        step = make_train_step(model, tx, pad_id=0)
        batch = shard_batch(
            {
                "image": np.zeros((8, 32, 32, 3), np.uint8),
                "text_in": np.ones((8, 3), np.int32),
                "target_y": np.ones((8, 3), np.int32),
            },
            mesh,
        )
        assert batch["image"].sharding.spec == P(DATA_AXIS, None, None, None)
        assert batch["image"].addressable_shards[0].data.shape[0] == 1
        params, bs, opt, loss = step(
            params, bs, opt, jax.random.PRNGKey(1), jnp.float32(1.0),
            batch["image"], batch["text_in"], batch["target_y"],
        )
        assert np.isfinite(float(loss))
        # updated params stay replicated across all 8 devices
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert len(leaf.addressable_shards) == 8


class TestMultiHost:
    def test_two_process_distributed_cpu(self, tmp_path):
        """Two real processes join one jax.distributed cluster (CPU
        backend) and run a cross-process psum through
        initialize_distributed + a shared mesh. This is the multi-host
        code path minus TPU hardware (documented boundary in
        parallel/mesh.py)."""
        import socket
        import subprocess
        import sys
        import textwrap

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        worker = tmp_path / "worker.py"
        worker.write_text(textwrap.dedent(f"""
            import os, sys
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("XLA_FLAGS", None)  # 1 local device per process
            import jax
            jax.config.update("jax_platforms", "cpu")
            sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
            from manuscript_tpu.parallel.mesh import (
                initialize_distributed, make_mesh, shard_batch,
            )
            pid = int(sys.argv[1])
            initialize_distributed(
                coordinator_address="127.0.0.1:{port}",
                num_processes=2,
                process_id=pid,
            )
            assert jax.process_count() == 2, jax.process_count()
            import numpy as np
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = make_mesh(n_devices=2)
            local = np.full((1, 4), float(pid + 1), np.float32)
            x = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data", None)), local, (2, 4)
            )
            total = jax.jit(
                lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
            )(x)
            got = float(np.asarray(jax.device_get(total)))
            assert got == 12.0, got  # (1+2) * 4
            print(f"proc {{pid}} psum OK", flush=True)
        """))

        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=300)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
            assert "psum OK" in out

    def test_two_process_fused_inference_cpu(self, tmp_path):
        """Multi-host INFERENCE analog of the psum test (VERDICT r4 task
        7): two real processes join one jax.distributed cluster, each
        holding half of a 2-device mesh, and ``predict_many`` shards pages
        across both — inputs staged with make_array_from_callback, outputs
        allgathered (fused._stage_sharded/_fetch). Both processes must
        produce the same complete page set."""
        import socket
        import subprocess
        import sys
        import textwrap

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        worker = tmp_path / "worker_infer.py"
        worker.write_text(textwrap.dedent(f"""
            import os, sys, json
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("XLA_FLAGS", None)  # 1 local device per process
            os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
            os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_disable_most_optimizations", True)
            sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
            from manuscript_tpu.parallel.mesh import (
                initialize_distributed, make_mesh,
            )
            pid = int(sys.argv[1])
            initialize_distributed(
                coordinator_address="127.0.0.1:{port}",
                num_processes=2,
                process_id=pid,
            )
            assert jax.process_count() == 2
            import numpy as np
            from manuscript_tpu.detectors import EAST
            from manuscript_tpu.recognizers import TRBA
            from manuscript_tpu.fused import FusedOCR
            import tempfile
            east = EAST(
                target_size=64, max_candidates=64, max_boxes=16,
                backbone="resnet50-tiny", score_thresh=0.1,
            )
            with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False
            ) as cf:
                json.dump({{"max_len": 4, "hidden_size": 16,
                           "img_h": 32, "img_w": 32}}, cf)
            trba = TRBA(config_path=cf.name, cnn_stage_plan="tiny")
            mesh = make_mesh(n_devices=2)
            assert len(mesh.devices.ravel()) == 2
            fused = FusedOCR(
                east, trba, max_words=8, mode="greedy",
                batch_pages=2, mesh=mesh,
            )
            page1 = np.full((64, 64, 3), 240, np.uint8)
            page1[10:22, 6:30] = 40
            page2 = np.full((64, 64, 3), 240, np.uint8)
            page2[30:44, 10:40] = 60
            # 4 pages / batch_pages=2 -> TWO chunks: multi-process runs
            # must execute every chunk's global programs and allgathers in
            # the same order on both processes (fused serializes the
            # native stages under multi-controller), so a 2-chunk run is
            # the regression test for cross-process ordering.
            pages = fused.predict_many([page1, page2, page2, page1])
            assert len(pages) == 4
            digest = [
                [(round(float(w.polygon[0][0]), 2), w.text)
                 for b in p.blocks for w in b.words]
                for p in pages
            ]
            print("DIGEST " + json.dumps(digest), flush=True)
            print(f"proc {{pid}} fused multihost OK", flush=True)
        """))

        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        digests = []
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
            assert "fused multihost OK" in out
            digests.append(
                next(
                    ln for ln in out.splitlines() if ln.startswith("DIGEST ")
                )
            )
        # both processes reconstructed the SAME complete page set
        assert digests[0] == digests[1]

    def test_explicit_kwargs_failure_raises(self):
        """Misconfigured multi-host must fail loudly, not fall back."""
        import subprocess
        import sys
        import textwrap

        code = textwrap.dedent("""
            import os, sys
            os.environ["JAX_PLATFORMS"] = "cpu"
            import jax
            jax.config.update("jax_platforms", "cpu")
            sys.path.insert(0, sys.argv[1])
            from manuscript_tpu.parallel.mesh import initialize_distributed
            try:
                initialize_distributed(
                    coordinator_address="127.0.0.1:1",  # nothing listens
                    num_processes=2,
                    process_id=1,
                    initialization_timeout=5,
                )
            except Exception:
                print("RAISED", flush=True)
            else:
                print("SWALLOWED", flush=True)
        """)
        repo = str(Path(__file__).resolve().parent.parent)
        out = subprocess.run(
            [sys.executable, "-c", code, repo],
            capture_output=True, text=True, timeout=120,
        )
        # "loudly" takes two shapes depending on the role: non-coordinator
        # workers die with an absl FATAL from the coordination client
        # (non-zero exit), coordinators raise a catchable Python error.
        # Either way the job must NOT continue single-host ("SWALLOWED").
        failed_loudly = "RAISED" in out.stdout or out.returncode != 0
        assert failed_loudly and "SWALLOWED" not in out.stdout, (
            out.stdout + out.stderr
        )
