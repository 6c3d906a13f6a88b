import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from manuscript_tpu.train.losses import (
    dice_loss,
    east_loss,
    soft_dice_coefficient,
    trba_ce_loss,
)
from manuscript_tpu.train.metrics import (
    aggregate_text_metrics,
    character_error_rate,
    compute_accuracy,
    compute_f1,
    compute_f1_metrics,
    poly_iou,
    word_error_rate,
)
from manuscript_tpu.train.optim import (
    cosine_warm_restarts,
    ema_update,
    lookahead,
    sam_gradient,
)


class TestEASTLoss:
    def test_perfect_prediction_near_zero(self):
        score = jnp.zeros((1, 8, 8)).at[:, 2:6, 2:6].set(1.0)
        geo = jnp.ones((1, 8, 8, 8))
        loss = east_loss(score, score, geo, geo)
        assert float(loss) < 1e-4

    def test_no_positive_pixels_zero_with_grad(self):
        score = jnp.zeros((1, 8, 8))
        geo = jnp.zeros((1, 8, 8, 8))

        def f(pred):
            return east_loss(score, jax.nn.sigmoid(pred), geo, geo)

        g = jax.grad(f)(jnp.zeros((1, 8, 8)))
        assert float(f(jnp.zeros((1, 8, 8)))) == 0.0
        assert np.all(np.isfinite(np.asarray(g)))

    def test_geo_error_increases_loss(self):
        score = jnp.ones((1, 8, 8))
        geo = jnp.zeros((1, 8, 8, 8))
        l0 = east_loss(score, score, geo, geo)
        l1 = east_loss(score, score, geo, geo + 1.0)
        assert float(l1) > float(l0)

    def test_ohem_and_focal_run(self):
        score = jnp.zeros((2, 8, 8)).at[:, :4].set(1.0)
        geo = jnp.zeros((2, 8, 8, 8))
        loss = east_loss(
            score, score * 0.9, geo, geo + 0.5,
            use_ohem=True, ohem_ratio=0.5, use_focal_geo=True,
        )
        assert np.isfinite(float(loss))

    def test_dice_extremes(self):
        a = jnp.ones((4, 4))
        assert float(dice_loss(a, a)) == pytest.approx(0.0, abs=1e-4)
        assert float(dice_loss(a, jnp.zeros((4, 4)))) == pytest.approx(1.0, abs=1e-4)
        assert float(soft_dice_coefficient(a, a)) == pytest.approx(1.0, abs=1e-4)


class TestTRBALoss:
    def test_pad_ignored(self):
        logits = jnp.zeros((1, 4, 5))
        targets_all_pad = jnp.zeros((1, 4), jnp.int32)
        loss = trba_ce_loss(logits, targets_all_pad, pad_id=0)
        assert float(loss) == 0.0

    def test_correct_class_lowers_loss(self):
        targets = jnp.array([[1, 2, 0, 0]], dtype=jnp.int32)
        good = jnp.zeros((1, 4, 5)).at[0, 0, 1].set(10.0).at[0, 1, 2].set(10.0)
        bad = jnp.zeros((1, 4, 5)).at[0, 0, 3].set(10.0)
        assert float(trba_ce_loss(good, targets, 0)) < float(
            trba_ce_loss(bad, targets, 0)
        )


class TestOptim:
    def test_sam_gradient_runs(self):
        def loss(p):
            return jnp.sum((p["w"] - 3.0) ** 2)

        params = {"w": jnp.zeros((4,))}
        l, g = sam_gradient(loss, params, rho=0.05, adaptive=True)
        assert np.isfinite(float(l))
        # gradient points downhill
        assert np.all(np.asarray(g["w"]) < 0)

    def test_sam_reduces_loss_with_sgd(self):
        def loss(p):
            return jnp.sum((p["w"] - 3.0) ** 2)

        tx = optax.sgd(0.1)
        params = {"w": jnp.zeros((4,))}
        opt = tx.init(params)
        for _ in range(50):
            l, g = sam_gradient(loss, params, rho=0.05, adaptive=False)
            upd, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, upd)
        assert float(loss(params)) < 1e-2

    def test_lookahead_sync(self):
        tx = optax.chain(optax.sgd(0.5), lookahead(k=2, alpha=0.5))
        params = {"w": jnp.array([0.0])}
        opt = tx.init(params)

        def g(p):
            return {"w": jnp.array([-1.0])}  # constant ascent direction

        # step 1: fast = 0.5; no sync
        upd, opt = tx.update(g(params), opt, params)
        params = optax.apply_updates(params, upd)
        assert params["w"][0] == pytest.approx(0.5)
        # step 2: fast = 1.0; sync → slow = 0 + 0.5*(1.0-0) = 0.5 → params 0.5
        upd, opt = tx.update(g(params), opt, params)
        params = optax.apply_updates(params, upd)
        assert params["w"][0] == pytest.approx(0.5)

    def test_ema(self):
        ema = {"w": jnp.zeros(2)}
        cur = {"w": jnp.ones(2)}
        out = ema_update(ema, cur, decay=0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)

    def test_warm_restarts_restarts(self):
        sched = cosine_warm_restarts(1.0, t_0=1, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(9)) < 0.1
        assert float(sched(10)) == pytest.approx(1.0)  # restart


class TestTextMetrics:
    def test_cer(self):
        assert character_error_rate("abc", "abc") == 0.0
        assert character_error_rate("abc", "abd") == pytest.approx(1 / 3)
        assert character_error_rate("", "") == 0.0
        assert character_error_rate("", "x") == float("inf")

    def test_wer(self):
        assert word_error_rate("a b c", "a b c") == 0.0
        assert word_error_rate("a b c", "a x c") == pytest.approx(1 / 3)

    def test_accuracy(self):
        assert compute_accuracy(["a", "b"], ["a", "c"]) == 0.5

    def test_aggregate(self):
        m = aggregate_text_metrics(["ab", "cd"], ["ab", "ce"])
        assert m["accuracy"] == 0.5
        assert m["cer"] == pytest.approx(0.25)


class TestDetectionF1:
    def _sq(self, x, y, s=10):
        return [x, y, x + s, y, x + s, y + s, x, y + s]

    def test_poly_iou_identical(self):
        assert poly_iou(self._sq(0, 0), self._sq(0, 0)) == pytest.approx(1.0)

    def test_perfect_match(self):
        gt = {1: [self._sq(0, 0), self._sq(20, 0)]}
        preds = [
            {"image_id": 1, "segmentation": self._sq(0, 0)},
            {"image_id": 1, "segmentation": self._sq(20, 0)},
        ]
        assert compute_f1(preds, 0.5, gt, [1]) == pytest.approx(1.0)

    def test_no_match(self):
        gt = {1: [self._sq(0, 0)]}
        preds = [{"image_id": 1, "segmentation": self._sq(100, 100)}]
        assert compute_f1(preds, 0.5, gt, [1]) == 0.0

    def test_partial(self):
        gt = {1: [self._sq(0, 0), self._sq(50, 50)]}
        preds = [{"image_id": 1, "segmentation": self._sq(0, 0)}]
        f1 = compute_f1(preds, 0.5, gt, [1])
        assert f1 == pytest.approx(2 / 3)

    def test_f1_metrics_range(self):
        gt = {1: [self._sq(0, 0)]}
        preds = [{"image_id": 1, "segmentation": self._sq(1, 1)}]
        m = compute_f1_metrics(preds, gt, [1])
        assert 0.0 <= m["f1@0.5:0.95"] <= m["f1@0.5"] <= 1.0
