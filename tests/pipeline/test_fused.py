"""Fused detect→recognize pipeline (fused.FusedOCR + Pipeline integration).

Random weights, tiny target sizes — contract + consistency with the classic
host-handoff path (same decode/top-k feeds both; LANMS device-vs-host
parity is pinned separately in tests/ops/test_lanms_jax.py).
"""

import json

import numpy as np
import pytest

from manuscript_tpu import Pipeline
from manuscript_tpu.detectors import EAST
from manuscript_tpu.recognizers import TRBA
from manuscript_tpu.types import Page

# Compile-heavy (XLA traces full models / fused program graphs):
# excluded from the default fast selection; CI runs the full suite.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def east():
    return EAST(target_size=128, max_candidates=512, max_boxes=64)


@pytest.fixture(scope="module")
def trba(tmp_path_factory):
    cfg = tmp_path_factory.mktemp("cfg") / "config.json"
    cfg.write_text(
        json.dumps({"max_len": 6, "hidden_size": 32, "img_h": 32, "img_w": 64})
    )
    return TRBA(config_path=str(cfg))


@pytest.fixture(scope="module")
def page_image():
    rng = np.random.default_rng(0)
    img = np.full((128, 128, 3), 240, dtype=np.uint8)
    img[20:40, 10:60] = int(rng.integers(20, 80))
    img[60:80, 30:100] = int(rng.integers(20, 80))
    return img


def _calibrated(east, img, lo=1, hi=40):
    """Find a threshold where the random-weight detector emits some boxes."""
    last = (0.5, 0)
    for t in (0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1):
        east.score_thresh = t
        n = sum(len(b.words) for b in east.predict(img)["page"].blocks)
        last = (t, n)
        if lo <= n <= hi:
            return t, n
    if last[1] == 0:
        pytest.skip("random-weight detector emitted no boxes at any threshold")
    return last


class TestFusedPipeline:
    def test_auto_fuses_native_components(self, east, trba):
        pipe = Pipeline(detector=east, recognizer=trba, mode="greedy")
        assert pipe._fused is not None

    def test_duck_typed_fallback(self):
        class FakeDet:
            def predict(self, image, vis=False, profile=False):
                return Page(blocks=[])

        class FakeRec:
            def predict(self, images):
                return []

        pipe = Pipeline(detector=FakeDet(), recognizer=FakeRec())
        assert pipe._fused is None
        assert isinstance(pipe.predict(np.zeros((32, 32, 3), np.uint8)), Page)

    def test_fused_true_raises_on_fakes(self):
        class FakeDet:
            pass

        with pytest.raises(ValueError):
            Pipeline(detector=FakeDet(), recognizer=FakeDet(), fused=True)

    def test_predict_contract_and_consistency(self, east, trba, page_image):
        thresh, n_classic = _calibrated(east, page_image)
        pipe = Pipeline(detector=east, recognizer=trba, mode="greedy")
        page = pipe.predict(page_image)
        assert isinstance(page, Page)
        n_fused = sum(len(b.words) for b in page.blocks)
        # same decode+top-k feeds both paths; NMS differs only in f32 vs
        # f64 and prev-vs-running merge — counts stay in the same regime.
        # The device path caps output at max_boxes (host path has no cap).
        assert n_fused >= max(1, min(n_classic, east.max_boxes) // 2 - 2)
        assert n_fused <= 2 * n_classic + 2
        texted = [
            w for b in page.blocks for w in b.words if w.text is not None
        ]
        assert texted, "fused path recognized no words"
        for w in texted:
            assert isinstance(w.text, str)
            assert 0.0 <= w.recognition_confidence <= 1.0

    def test_vis_and_profile(self, east, trba, page_image, capsys):
        from PIL import Image

        pipe = Pipeline(detector=east, recognizer=trba, mode="greedy")
        out = pipe.predict(page_image, vis=True, profile=True)
        assert isinstance(out, tuple) and len(out) == 2
        assert isinstance(out[1], Image.Image)
        assert "Fused pipeline" in capsys.readouterr().out

    def test_process_batch_fused(self, east, trba, page_image):
        pipe = Pipeline(detector=east, recognizer=trba, mode="greedy")
        pages = pipe.process_batch([page_image, page_image, page_image])
        assert len(pages) == 3
        counts = [sum(len(b.words) for b in p.blocks) for p in pages]
        assert counts[0] == counts[1] == counts[2]

    def test_max_words_cap(self, east, trba, page_image):
        east.score_thresh, _ = _calibrated(east, page_image)
        pipe = Pipeline(
            detector=east, recognizer=trba, mode="greedy", max_words=1
        )
        page = pipe.predict(page_image)
        texted = [
            w for b in page.blocks for w in b.words if w.text is not None
        ]
        assert len(texted) <= 1

    def test_recognize_text_false_uses_classic(self, east, trba, page_image):
        pipe = Pipeline(detector=east, recognizer=trba, mode="greedy")
        page = pipe.predict(page_image, recognize_text=False)
        assert isinstance(page, Page)
        for b in page.blocks:
            for w in b.words:
                assert w.text is None

    def test_predict_many_batched_matches_single(self, east, trba, page_image):
        """The vmapped multi-page program gives the same pages as the
        per-page program (chunk padding rows are dropped)."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        img2 = page_image.copy()
        img2[90:110, 40:80] = 50
        fused = FusedOCR(
            east, trba, max_words=16, mode="greedy", batch_pages=2
        )
        singles = [fused.predict(page_image), fused.predict(img2)]
        # 3 pages = one full chunk + one padded chunk
        many = fused.predict_many([page_image, img2, page_image])
        assert len(many) == 3
        for got, want in zip(many, singles + [singles[0]]):
            gw = [w for b in got.blocks for w in b.words]
            ww = [w for b in want.blocks for w in b.words]
            assert len(gw) == len(ww)
            assert [w.text for w in gw] == [w.text for w in ww]
            for a, b in zip(gw, ww):
                np.testing.assert_allclose(
                    np.asarray(a.polygon), np.asarray(b.polygon),
                    rtol=1e-4, atol=0.1,
                )

    def test_transport_delta_lossless(self, east, trba, page_image):
        """Row-delta transport is bit-lossless: identical pages out."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        raw = FusedOCR(
            east, trba, max_words=16, mode="greedy", transport="raw"
        ).predict(page_image)
        delta = FusedOCR(
            east, trba, max_words=16, mode="greedy", transport="delta"
        ).predict(page_image)
        rw = [(w.polygon, w.text) for b in raw.blocks for w in b.words]
        dw = [(w.polygon, w.text) for b in delta.blocks for w in b.words]
        assert rw == dw


    def test_beam_mode_unpacks(self, east, trba, page_image):
        """Beam emits max_len steps (vs greedy's max_len+1) — the packed
        buffer must unpack at the right offsets, boxes identical to greedy."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        g = FusedOCR(east, trba, max_words=8, mode="greedy").predict(
            page_image
        )
        b = FusedOCR(
            east, trba, max_words=8, mode="beam", beam_size=2
        ).predict(page_image)
        gw = [w for blk in g.blocks for w in blk.words]
        bw = [w for blk in b.blocks for w in blk.words]
        assert len(gw) == len(bw)
        for a, c in zip(gw, bw):
            np.testing.assert_allclose(
                np.asarray(a.polygon), np.asarray(c.polygon), atol=1e-3
            )
        texted = [w for w in bw if w.text is not None]
        assert texted
        for w in texted:
            assert 0.0 <= w.recognition_confidence <= 1.0


class TestOutputPacking:
    def test_int_payloads_survive_f32_packing(self):
        """Ints must cross the packed f32 buffer as exact VALUES. A bitcast
        encoding dies here: XLA's f32 pipeline may flush denormals (small
        ints) to zero and canonicalize NaNs (-1 bit pattern) — observed on
        XLA:CPU, which silently blanked every recognized token."""
        import jax
        import jax.numpy as jnp

        @jax.jit
        def pack(ints, floats):
            return jnp.concatenate([floats, ints.astype(jnp.float32)])

        ints = jnp.asarray([0, 1, 2, 3, -1, 193, 1023], jnp.int32)
        out = np.asarray(pack(ints, jnp.asarray([0.5], jnp.float32)))
        got = np.rint(out[1:]).astype(np.int32)
        np.testing.assert_array_equal(got, np.asarray(ints))

    def test_fused_recognizes_nonpad_tokens(self, east, trba, page_image):
        """End-to-end: the unpacked token ids must round-trip the device
        program (not collapse to PAD), so text is genuinely decoded."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        f = FusedOCR(east, trba, max_words=16, mode="greedy")
        img, outs, meta = f._dispatch(page_image)
        _, _, _, wvalid, preds, _, _ = f._unpack(np.asarray(outs), *meta)
        n = int(wvalid.sum())
        assert n > 0
        # greedy emits an argmax token every step; with random weights the
        # chance all steps of all words hit PAD(0) is ~0 — all-zero rows
        # mean the transport destroyed the payload
        assert np.any(preds[:n] != 0)


class TestAutoCapacity:
    def test_calibrate_one_dispatch_matches_host_counts(
        self, east, trba, page_image
    ):
        """The count-only program's per-threshold eligible-word counts must
        track the host predict() path's word counts (same decode + NMS
        semantics, device vs host implementations)."""
        from manuscript_tpu.fused import FusedOCR

        thresh, n = _calibrated(east, page_image)
        f = FusedOCR(east, trba, max_words=16, mode="greedy")
        chosen, counts = f.calibrate(
            page_image, thresholds=(thresh,), target_max_words=250
        )
        assert chosen == pytest.approx(thresh)
        # device LANMS merges chains slightly differently (documented
        # delta) — counts must be in the same ballpark, not bit-equal
        assert counts[thresh] >= 1
        assert abs(counts[thresh] - n) <= max(3, n)

    def test_auto_capacity_resolves_and_recognizes(
        self, east, trba, page_image
    ):
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        f = FusedOCR(east, trba, mode="greedy")  # max_words defaults "auto"
        assert f.max_words is None
        page = f.predict(page_image)
        assert f.max_words in f.capacity_buckets
        assert f.last_dropped == 0
        words = [w for b in page.blocks for w in b.words]
        assert any(w.text is not None for w in words)

    def test_overflow_detected_and_capacity_grows(
        self, east, trba, page_image
    ):
        """A deliberately tiny bucket must detect the overflow in-band,
        re-bucket upward, and transparently re-run the page at the grown
        capacity — the returned page loses no recognized words."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, n = _calibrated(east, page_image)
        if n < 2:
            pytest.skip("need >=2 detected words to overflow capacity 1")
        f = FusedOCR(
            east,
            trba,
            max_words="auto",
            mode="greedy",
            capacity_buckets=(1, 256),
            capacity_headroom=0,
        )
        f._apply_capacity(1)  # force the undersized bucket
        page = f.predict(page_image)
        assert f.last_overflow >= 1  # the overflow happened...
        assert f.last_dropped == 0  # ...and the re-run recovered it
        assert f.max_words == 256  # grown for subsequent pages
        texted = [
            w for b in page.blocks for w in b.words if w.text is not None
        ]
        assert len(texted) >= 2  # more words than the tiny bucket held
        # (pinned-capacity drop semantics — no retry — is covered by
        # test_max_words_cap)


class TestCropScale:
    def test_crop_scale2_same_boxes_text_produced(
        self, east, trba, page_image
    ):
        """crop_scale=2 uploads a 2× copy for cropping: detection boxes are
        untouched (same detector input), words still get text."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        base = FusedOCR(east, trba, max_words=8, mode="greedy").predict(
            page_image
        )
        hi = FusedOCR(
            east, trba, max_words=8, mode="greedy", crop_scale=2
        ).predict(page_image)
        bw = [w for b in base.blocks for w in b.words]
        hw = [w for b in hi.blocks for w in b.words]
        assert len(bw) == len(hw)
        for a, b in zip(bw, hw):
            np.testing.assert_allclose(
                np.asarray(a.polygon), np.asarray(b.polygon), atol=0.1
            )
        assert any(w.text is not None for w in hw)

    def test_crop_scale2_predict_many(self, east, trba, page_image):
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        f = FusedOCR(
            east, trba, max_words=8, mode="greedy", crop_scale=2,
            batch_pages=2,
        )
        single = f.predict(page_image)
        many = f.predict_many([page_image, page_image, page_image])
        assert len(many) == 3
        sw = [w.text for b in single.blocks for w in b.words]
        for got in many:
            assert [w.text for b in got.blocks for w in b.words] == sw

    def test_predict_many_prep_error_propagates(self, east, trba, page_image):
        """An unreadable image inside a chunk must surface as the usual
        FileNotFoundError from the background prep thread — promptly, with
        the executor torn down (no hang, no swallowed error)."""
        from manuscript_tpu.fused import FusedOCR

        east.score_thresh, _ = _calibrated(east, page_image)
        fused = FusedOCR(
            east, trba, max_words=8, mode="greedy", batch_pages=2
        )
        with pytest.raises(FileNotFoundError):
            fused.predict_many(
                [page_image, "/no/such/page.png", page_image, page_image]
            )
        # the instance stays usable after the failed call
        assert len(fused.predict_many([page_image, page_image])) == 2
