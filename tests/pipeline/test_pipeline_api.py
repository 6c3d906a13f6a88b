"""Pipeline contract tests with fake backends.

Models the reference's fake-backend pattern (reference:
tests/test_pipeline_api_compatibility.py:15-238): the pipeline must accept
all three detector return formats and all three recognizer result formats,
honor recognize_text/vis/min_text_size, and expose get_text.
"""

import numpy as np
import pytest
from PIL import Image

from manuscript_tpu import Pipeline
from manuscript_tpu.types import Block, Page, Word


def _page(polys=None):
    polys = polys or [[(10, 10), (90, 10), (90, 40), (10, 40)]]
    words = [Word(polygon=p, detection_confidence=0.9) for p in polys]
    return Page(blocks=[Block(words=words)])


class DummyDetector:
    """Returns dict / tuple / bare Page depending on ``fmt``."""

    def __init__(self, fmt="dict", polys=None):
        self.fmt = fmt
        self.polys = polys
        self.calls = 0

    def predict(self, image, vis=False, profile=False):
        self.calls += 1
        page = _page(self.polys)
        if self.fmt == "dict":
            return {"page": page, "vis_image": None}
        if self.fmt == "tuple":
            return (page, None)
        return page


class DummyRecognizer:
    def __init__(self, result_fmt="dict"):
        self.result_fmt = result_fmt
        self.calls = 0
        self.num_images = 0

    def predict(self, images):
        self.calls += 1
        self.num_images += len(images)
        if self.result_fmt == "dict":
            return [{"text": f"w{i}", "confidence": 0.5} for i in range(len(images))]
        if self.result_fmt == "tuple":
            return [(f"w{i}", 0.5) for i in range(len(images))]
        return [f"w{i}" for i in range(len(images))]


@pytest.fixture
def image():
    return np.full((100, 100, 3), 255, dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["dict", "tuple", "bare"])
def test_detector_return_formats(image, fmt):
    pipe = Pipeline(detector=DummyDetector(fmt=fmt), recognizer=DummyRecognizer())
    page = pipe.predict(image)
    assert isinstance(page, Page)
    assert page.blocks[0].words[0].text == "w0"


@pytest.mark.parametrize("result_fmt", ["dict", "tuple", "bare"])
def test_recognizer_result_formats(image, result_fmt):
    pipe = Pipeline(
        detector=DummyDetector(), recognizer=DummyRecognizer(result_fmt=result_fmt)
    )
    page = pipe.predict(image)
    w = page.blocks[0].words[0]
    assert w.text == "w0"
    if result_fmt == "bare":
        assert w.recognition_confidence is None
    else:
        assert w.recognition_confidence == pytest.approx(0.5)


def test_recognize_text_false_skips_recognizer(image):
    rec = DummyRecognizer()
    pipe = Pipeline(detector=DummyDetector(), recognizer=rec)
    page = pipe.predict(image, recognize_text=False)
    assert rec.calls == 0
    assert page.blocks[0].words[0].text is None


def test_vis_returns_page_and_pil(image):
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    out = pipe.predict(image, vis=True)
    assert isinstance(out, tuple) and len(out) == 2
    page, vis_img = out
    assert isinstance(page, Page)
    assert isinstance(vis_img, Image.Image)
    assert vis_img.mode == "RGB"


def test_vis_without_recognition(image):
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    page, vis_img = pipe.predict(image, recognize_text=False, vis=True)
    assert isinstance(vis_img, Image.Image)


def test_min_text_size_filters_small_words(image):
    tiny = [(0, 0), (3, 0), (3, 3), (0, 3)]
    big = [(10, 10), (90, 10), (90, 40), (10, 40)]
    rec = DummyRecognizer()
    pipe = Pipeline(
        detector=DummyDetector(polys=[tiny, big]),
        recognizer=rec,
        min_text_size=5,
    )
    pipe.predict(image)
    assert rec.num_images == 1


def test_min_text_size_all_filtered_no_recognizer_call(image):
    tiny = [(0, 0), (3, 0), (3, 3), (0, 3)]
    rec = DummyRecognizer()
    pipe = Pipeline(detector=DummyDetector(polys=[tiny]), recognizer=rec)
    pipe.predict(image)
    assert rec.calls == 0


def test_get_text_orders_by_x(image):
    left = [(10, 10), (40, 10), (40, 40), (10, 40)]
    right = [(50, 10), (90, 10), (90, 40), (50, 40)]
    pipe = Pipeline(
        detector=DummyDetector(polys=[right, left]), recognizer=DummyRecognizer()
    )
    page = pipe.predict(image)
    text = pipe.get_text(page)
    # words are reading-order sorted before recognition: left gets w0
    assert text == "w0 w1"


def test_get_text_skips_unrecognized():
    page = _page()
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    assert pipe.get_text(page) == ""


def test_process_batch(image):
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    results = pipe.process_batch([image, image])
    assert len(results) == 2
    assert all(isinstance(p, Page) for p in results)


def test_process_batch_with_vis(image):
    # vis=True yields (page, vis_image) tuples on every path — the
    # per-page fallback matches the batched detector path's shape
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    results = pipe.process_batch([image], vis=True)
    assert isinstance(results[0], tuple) and len(results[0]) == 2
    assert isinstance(results[0][0], Page)
    assert isinstance(results[0][1], Image.Image)


def test_reading_order_applied(image):
    # second line first in detector output → pipeline reorders
    line2 = [(10, 60), (90, 60), (90, 80), (10, 80)]
    line1 = [(10, 10), (90, 10), (90, 30), (10, 30)]
    pipe = Pipeline(
        detector=DummyDetector(polys=[line2, line1]), recognizer=DummyRecognizer()
    )
    page = pipe.predict(image)
    ys = [w.polygon[0][1] for w in page.blocks[0].words]
    assert ys == sorted(ys)


def test_string_path_input(tmp_path):
    img = np.full((64, 64, 3), 200, dtype=np.uint8)
    p = tmp_path / "page.png"
    Image.fromarray(img).save(p)
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    page = pipe.predict(str(p))
    assert isinstance(page, Page)


def test_pil_input():
    img = Image.new("RGB", (100, 100), (255, 255, 255))
    pipe = Pipeline(detector=DummyDetector(), recognizer=DummyRecognizer())
    page = pipe.predict(img)
    assert isinstance(page, Page)


class BatchedDummyDetector(DummyDetector):
    """Detector exposing the predict_batch fast path."""

    def predict_batch(self, images, batch_size=1, vis=False, profile=False,
                      sort_reading_order=False):
        self.calls += 1
        return [{"page": _page(self.polys), "vis_image": None} for _ in images]


def test_process_batch_uses_predict_batch(image):
    det = BatchedDummyDetector()
    rec = DummyRecognizer()
    pipe = Pipeline(detector=det, recognizer=rec)
    pages = pipe.process_batch([image, image, image])
    assert len(pages) == 3
    assert det.calls == 1  # one batched call, not three
    assert rec.calls == 1  # all crops in one recognition stream
    for p in pages:
        assert p.blocks[0].words[0].text is not None


def test_process_batch_batched_no_recognition(image):
    det = BatchedDummyDetector()
    rec = DummyRecognizer()
    pipe = Pipeline(detector=det, recognizer=rec)
    pages = pipe.process_batch([image, image], recognize_text=False)
    assert rec.calls == 0
    assert all(p.blocks[0].words[0].text is None for p in pages)


def test_process_batch_batched_vis(image):
    det = BatchedDummyDetector()
    pipe = Pipeline(detector=det, recognizer=DummyRecognizer())
    out = pipe.process_batch([image], vis=True)
    page, vis_img = out[0]
    assert isinstance(page, Page)
    assert isinstance(vis_img, Image.Image)
