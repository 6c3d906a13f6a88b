"""FULL-MODEL conversion parity vs the reference's actual torch models.

SURVEY.md §7 hard-part #4 / VERDICT r1 missing #2: build the reference's
real ``EAST`` (detectors/_east/east.py:96-139) and ``TRBAModel``
(recognizers/_trba/model/model.py:338-416) with random weights, convert the
torch state dict through ``utils/convert.py``, and diff model outputs
end-to-end — this proves the converter's numerics, not just its key
coverage. torchvision is absent here, so the reference imports run against
``torchvision_stub`` (eval-mode-faithful ResNet/feature-extractor/DropBlock).

Reference modules are imported file-by-file via a synthetic package (the
real ``manuscript`` package root pulls in cv2-heavy inference code and
gdown, none of which these tests need).
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference/src/manuscript")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available"
)


def _install_stub():
    import importlib.util

    if "torchvision_stub" in sys.modules:
        sys.modules["torchvision_stub"].install()
        return
    stub_path = Path(__file__).parent / "torchvision_stub.py"
    spec = importlib.util.spec_from_file_location("torchvision_stub", stub_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["torchvision_stub"] = mod
    spec.loader.exec_module(mod)
    mod.install()


def _ref_module(pkg_name: str, pkg_dir: Path, module: str):
    _install_stub()
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [str(pkg_dir)]
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{module}")


@pytest.fixture(scope="module")
def ref_east():
    return _ref_module("_ref_east", REF / "detectors" / "_east", "east")


@pytest.fixture(scope="module")
def ref_trba():
    return _ref_module(
        "_ref_trba", REF / "recognizers" / "_trba" / "model", "model"
    )


@pytest.mark.slow
class TestEASTFullModelParity:
    def test_forward_parity_resnet50(self, ref_east):
        import torch

        from manuscript_tpu.models.east import EASTModel
        from manuscript_tpu.utils.convert import convert_east, merge_converted

        torch.manual_seed(0)
        tmodel = ref_east.EAST(
            backbone_name="resnet50", pretrained_backbone=False
        ).eval()
        x_t = torch.randn(1, 3, 64, 64) * 0.25
        with torch.no_grad():
            out_t = tmodel(x_t)

        state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        jmodel = EASTModel(backbone="resnet50", dtype=jnp.float32)
        init_vars = jmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        variables = merge_converted(init_vars, convert_east(state, "resnet50"))

        x_j = jnp.transpose(jnp.asarray(x_t.numpy()), (0, 2, 3, 1))
        out_j = jmodel.apply(variables, x_j)

        score_t = out_t["score"].numpy()[0, 0]  # (H/4, W/4)
        geo_t = np.transpose(out_t["geometry"].numpy()[0], (1, 2, 0))
        score_j = np.asarray(out_j["score"])[0, :, :, 0]
        geo_j = np.asarray(out_j["geometry"])[0]

        assert score_j.shape == score_t.shape
        assert geo_j.shape == geo_t.shape
        # score is post-sigmoid ∈ (0,1): absolute tolerance is meaningful
        np.testing.assert_allclose(score_j, score_t, atol=2e-4, rtol=1e-3)
        # geometry is raw; fresh-init BN (var=1) lets activations grow, so
        # compare relative to the map's scale
        scale = max(np.abs(geo_t).max(), 1.0)
        np.testing.assert_allclose(
            geo_j / scale, geo_t / scale, atol=5e-4, rtol=1e-3
        )


@pytest.mark.slow
class TestTRBAFullModelParity:
    @pytest.fixture(scope="class")
    def converted(self, ref_trba):
        import torch

        from manuscript_tpu.models.trba import TRBAModel
        from manuscript_tpu.utils.convert import convert_trba, merge_converted

        torch.manual_seed(1)
        num_classes, hidden = 20, 64
        tmodel = ref_trba.TRBAModel(
            num_classes=num_classes,
            hidden_size=hidden,
            sos_id=1,
            eos_id=2,
            pad_id=0,
            blank_id=3,
        ).eval()
        state = {k: v.numpy() for k, v in tmodel.state_dict().items()}

        jmodel = TRBAModel(
            num_classes=num_classes,
            hidden_size=hidden,
            sos_id=1,
            eos_id=2,
            pad_id=0,
            blank_id=3,
            dtype=jnp.float32,
        )
        init_vars = jmodel.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 96, 3), jnp.float32),
            jnp.zeros((1, 6), jnp.int32),
        )
        variables = merge_converted(init_vars, convert_trba(state))

        torch.manual_seed(2)
        x_t = torch.randn(2, 3, 32, 96) * 0.25
        x_j = jnp.transpose(jnp.asarray(x_t.numpy()), (0, 2, 3, 1))
        return tmodel, jmodel, variables, x_t, x_j

    def test_encoder_parity(self, converted):
        import torch

        tmodel, jmodel, variables, x_t, x_j = converted
        with torch.no_grad():
            enc_t = tmodel.encode(x_t).numpy()  # (B, W', H)
        enc_j = np.asarray(
            jmodel.apply(variables, x_j, method="encode")
        )
        assert enc_j.shape == enc_t.shape
        scale = max(np.abs(enc_t).max(), 1e-6)
        np.testing.assert_allclose(
            enc_j / scale, enc_t / scale, atol=2e-4, rtol=1e-3
        )

    def test_greedy_decode_parity(self, converted):
        import torch

        tmodel, jmodel, variables, x_t, x_j = converted
        max_len = 8
        with torch.no_grad():
            logits_t, preds_t = tmodel(
                x_t, is_train=False, batch_max_length=max_len, mode="greedy"
            )
        logits_j, preds_j = jmodel.apply(
            variables, x_j, max_len=max_len, method="greedy"
        )
        logits_t, preds_t = logits_t.numpy(), preds_t.numpy()
        logits_j, preds_j = np.asarray(logits_j), np.asarray(preds_j)

        # the reference early-exits once every row emitted EOS; ours is a
        # fixed-length scan — compare the overlapping steps
        t = min(preds_t.shape[1], preds_j.shape[1])
        np.testing.assert_array_equal(
            preds_j[:, :t], preds_t[:, :t]
        ), "greedy tokens must be bit-equal"
        scale = max(np.abs(logits_t).max(), 1e-6)
        np.testing.assert_allclose(
            logits_j[:, :t] / scale, logits_t[:, :t] / scale,
            atol=5e-4, rtol=1e-3,
        )
