"""End-to-end OCR pipeline: detect → order → crop → recognize → attach.

Public contract parity with the reference Pipeline (reference:
src/manuscript/_pipeline.py:17-221 and docs/PIPELINE_API.md):

* Detector duck-type: ``predict(image, vis=False, profile=False)`` may return
  a dict with ``"page"``, a tuple whose first element is a Page, or a bare
  Page.
* Recognizer duck-type: ``predict(list_of_ndarrays)`` returning dicts with
  ``text``/``confidence``, ``(text, confidence)`` tuples, or bare values.
* ``process_batch`` is implemented correctly here (the reference's calls a
  nonexistent method — SURVEY.md §7 quirks).

Crops are axis-aligned bbox slices of each word polygon, identical to the
reference (no perspective warp on the inference path).
"""

from __future__ import annotations

import time
from typing import List, Optional, Union

import numpy as np
from PIL import Image

from .ops.image import crop_axis_aligned, read_image
from .ops.boxes import quad_bbox_int
from .ops.reading_order import reading_order_permutation
from .utils.visualize import visualize_page


class Pipeline:
    def __init__(
        self,
        detector=None,
        recognizer=None,
        min_text_size: int = 5,
        fused: object = "auto",
        mode: str = "beam",
        beam_size: int = 8,
        alpha: float = 0.9,
        temperature: float = 1.7,
        max_words: Union[int, str] = "auto",
        batch_pages: int = 4,
        crop_scale: int = 1,
        crop_source: str = "native",
        mesh=None,
    ):
        """OCR pipeline over a pluggable detector + recognizer.

        Passing None for either slot instantiates the default EAST / TRBA
        (lazy import so contract tests with fakes never touch model code).

        ``fused``: "auto" (default) routes ``predict``/``process_batch``
        through the single-device-program fused path (fused.FusedOCR — the
        detector→recognizer handoff stays in HBM) whenever both components
        are the native EAST/TRBA wrappers; duck-typed components fall back
        to the classic host loop. True forces it (raises if not fusable),
        False disables. ``mode``/``beam_size``/``alpha``/``temperature``
        set the fused decode (defaults match TRBA.predict); ``max_words``
        caps recognized words per page on the fused path ("auto" sizes the
        compiled capacity to the first page seen — fused.FusedOCR);
        ``batch_pages``
        is how many pages ``process_batch`` rides through one vmapped
        device program (one upload/dispatch/fetch per chunk);
        ``crop_source`` picks the fused path's crop source — "native"
        (default) runs the two-phase program pair whose crops are the
        reference's exact native-resolution host crops; "device" runs the
        one-program path that gathers crops from the detector-resolution
        copy in HBM (lowest link cost, documented resolution delta);
        ``crop_scale=k`` uploads a (k·target)² page copy so device-path
        crops sample k× finer than detector resolution (fused.FusedOCR);
        ``mesh`` (a ``jax.sharding.Mesh``, see parallel.mesh.make_mesh)
        shards the fused multi-page program's page axis over the mesh's
        'data' axis — multi-chip inference for ``process_batch``/serving.
        """
        if detector is None:
            from .detectors import EAST

            detector = EAST()
        if recognizer is None:
            from .recognizers import TRBA

            recognizer = TRBA()
        self.detector = detector
        self.recognizer = recognizer
        self.min_text_size = min_text_size
        self._decode_kwargs = dict(
            mode=mode, beam_size=beam_size, alpha=alpha,
            temperature=temperature,
        )

        self._fused = None
        if fused is True or fused == "auto":
            if self._fusable(detector, recognizer):
                from .fused import FusedOCR

                self._fused = FusedOCR(
                    detector,
                    recognizer,
                    max_words=max_words,
                    mode=mode,
                    beam_size=beam_size,
                    alpha=alpha,
                    temperature=temperature,
                    min_text_size=min_text_size,
                    batch_pages=batch_pages,
                    crop_scale=crop_scale,
                    crop_source=crop_source,
                    mesh=mesh,
                )
            elif fused is True:
                raise ValueError(
                    "fused=True needs native EAST + TRBA components "
                    "(duck-typed detector/recognizer can't be fused)."
                )
        # chunk size the serving layer should coalesce to (FusedOCR may
        # round it up to a multiple of the mesh's data-axis size)
        self.batch_pages = (
            self._fused.batch_pages if self._fused is not None else batch_pages
        )

    def _call_recognizer(self, word_images):
        """Recognize crops honoring the pipeline's decode config when the
        recognizer supports it (native TRBA); duck-typed recognizers with a
        bare ``predict(images)`` signature still work (reference contract,
        docs/PIPELINE_API.md). The signature is inspected rather than
        probed with a try/except so a TypeError raised INSIDE a
        kwargs-capable recognizer isn't masked by a silent retry that
        drops the configured decode parameters. The recognizer is fixed at
        construction, so the decision is computed once and cached."""
        if self._decode_kwargs:
            accepts = getattr(self, "_recognizer_accepts_kwargs", None)
            if accepts is None:
                try:
                    import inspect

                    params = inspect.signature(
                        self.recognizer.predict
                    ).parameters
                    accepts = any(
                        p.kind == inspect.Parameter.VAR_KEYWORD
                        for p in params.values()
                    ) or all(k in params for k in self._decode_kwargs)
                except (TypeError, ValueError):  # builtins/C callables
                    accepts = False
                self._recognizer_accepts_kwargs = accepts
            if accepts:
                return self.recognizer.predict(
                    word_images, **self._decode_kwargs
                )
        return self.recognizer.predict(word_images)

    @staticmethod
    def _fusable(detector, recognizer) -> bool:
        return all(
            hasattr(detector, a)
            for a in ("model", "variables", "max_boxes", "max_candidates")
        ) and all(
            hasattr(recognizer, a) for a in ("model", "variables", "itos")
        )

    def predict(
        self,
        image: Union[str, np.ndarray, Image.Image],
        recognize_text: bool = True,
        vis: bool = False,
        profile: bool = False,
    ):
        start_time = time.time()

        if self._fused is not None and recognize_text:
            return self._fused.predict(image, vis=vis, profile=profile)

        # ---- detection ----
        t0 = time.time()
        det_out = self.detector.predict(image, vis=False, profile=profile)
        if isinstance(det_out, dict):
            page = det_out.get("page")
        elif isinstance(det_out, tuple):
            page = det_out[0]
        else:
            page = det_out
        if page is None:
            raise RuntimeError("Detector did not return a Page result.")
        if profile:
            print(f"Detection: {time.time() - t0:.3f}s")

        if not recognize_text:
            if vis:
                arr = read_image(image)
                pil = image if isinstance(image, Image.Image) else Image.fromarray(arr)
                return page, visualize_page(pil, page, show_order=False)
            return page

        # ---- load full-res page for crops ----
        t0 = time.time()
        image_array = read_image(image)
        if profile:
            print(f"Load image for crops: {time.time() - t0:.3f}s")

        # ---- per-block reading order + crop extraction ----
        t0 = time.time()
        all_words = []
        word_images = []
        for block in page.blocks:
            boxes = [
                quad_bbox_int(np.asarray(w.polygon, dtype=np.int32))
                for w in block.words
            ]
            perm = reading_order_permutation(boxes)
            block.words = [block.words[i] for i in perm]

            for word in block.words:
                poly = np.asarray(word.polygon, dtype=np.int32)
                x_min, y_min, x_max, y_max = quad_bbox_int(poly)
                if (
                    x_max - x_min >= self.min_text_size
                    and y_max - y_min >= self.min_text_size
                ):
                    region = crop_axis_aligned(image_array, poly)
                    if region is not None and region.size > 0:
                        all_words.append(word)
                        word_images.append(region)
        if profile:
            print(f"Extract {len(word_images)} crops: {time.time() - t0:.3f}s")

        # ---- recognition ----
        if word_images:
            t0 = time.time()
            recognition_results = self._call_recognizer(word_images)
            if profile:
                print(f"Recognition: {time.time() - t0:.3f}s")

            for word, result in zip(all_words, recognition_results):
                if isinstance(result, dict):
                    text = result.get("text", "")
                    confidence = result.get("confidence", None)
                elif isinstance(result, tuple) and len(result) == 2:
                    text, confidence = result
                else:
                    text = str(result) if result is not None else ""
                    confidence = None
                word.text = text
                word.recognition_confidence = confidence

        if profile:
            print(f"Pipeline total: {time.time() - start_time:.3f}s")

        if vis:
            pil = (
                image
                if isinstance(image, Image.Image)
                else Image.fromarray(image_array)
            )
            return page, visualize_page(pil, page, show_order=True)
        return page

    def process_batch(
        self,
        images: List[Union[str, np.ndarray, Image.Image]],
        recognize_text: bool = True,
        vis: bool = False,
        profile: bool = False,
        detector_batch_size: int = 1,
    ):
        """OCR many pages, returning one Page each.

        When the detector exposes ``predict_batch`` (our EAST does), pages
        are detected in batched device programs and ALL crops across pages
        are recognized in one stream — amortizing device dispatch and
        filling the recognizer's batch buckets (the reference's version was
        a broken stub; SURVEY.md §7 quirks)."""
        if self._fused is not None and recognize_text:
            return self._fused.predict_many(images, vis=vis, profile=profile)

        if not hasattr(self.detector, "predict_batch"):
            # per-page fallback; vis=True keeps (page, vis_image) tuples,
            # matching the batched path's return shape
            return [
                self.predict(
                    img, recognize_text=recognize_text, vis=vis, profile=profile
                )
                for img in images
            ]

        t_start = time.time()
        arrays = [read_image(im) for im in images]
        det_results = self.detector.predict_batch(
            arrays, batch_size=detector_batch_size, profile=profile
        )
        pages = []
        for r in det_results:
            if isinstance(r, dict):
                pages.append(r.get("page"))
            elif isinstance(r, tuple):
                pages.append(r[0])
            else:
                pages.append(r)
        if profile:
            print(f"Batch detection ({len(images)} pages): {time.time() - t_start:.3f}s")

        if recognize_text:
            t0 = time.time()
            all_words, word_images = [], []
            for img_arr, page in zip(arrays, pages):
                for block in page.blocks:
                    boxes = [
                        quad_bbox_int(np.asarray(w.polygon, dtype=np.int32))
                        for w in block.words
                    ]
                    perm = reading_order_permutation(boxes)
                    block.words = [block.words[i] for i in perm]
                    for word in block.words:
                        poly = np.asarray(word.polygon, dtype=np.int32)
                        x_min, y_min, x_max, y_max = quad_bbox_int(poly)
                        if (
                            x_max - x_min >= self.min_text_size
                            and y_max - y_min >= self.min_text_size
                        ):
                            region = crop_axis_aligned(img_arr, poly)
                            if region is not None and region.size > 0:
                                all_words.append(word)
                                word_images.append(region)

            if word_images:
                recognition_results = self._call_recognizer(word_images)
                for word, result in zip(all_words, recognition_results):
                    if isinstance(result, dict):
                        word.text = result.get("text", "")
                        word.recognition_confidence = result.get("confidence")
                    elif isinstance(result, tuple) and len(result) == 2:
                        word.text, word.recognition_confidence = result
                    else:
                        word.text = str(result) if result is not None else ""
            if profile:
                print(
                    f"Batch recognition ({len(word_images)} crops): "
                    f"{time.time() - t0:.3f}s"
                )

        if vis:
            return [
                (page, visualize_page(Image.fromarray(arr), page, show_order=True))
                for arr, page in zip(arrays, pages)
            ]
        if profile:
            print(f"Batch pipeline total: {time.time() - t_start:.3f}s")
        return pages

    def start_batch(self, images: List[Union[str, np.ndarray, Image.Image]]):
        """Async half of ``process_batch`` for the serving layer: on the
        fused path, run host prep + device dispatch now (so the caller can
        overlap the next batch's prep with this one's device compute) and
        return a handle for :meth:`finish_batch`. Non-fused pipelines have
        no async stage — the handle just carries the images."""
        if self._fused is not None:
            return ("fused", self._fused.start_batch(images))
        return ("classic", images)

    def finish_batch(self, handle) -> List[Any]:
        """Block for a ``start_batch`` handle's pages."""
        kind, payload = handle
        if kind == "fused":
            return self._fused.finish_batch(payload)
        return self.process_batch(payload)

    def get_text(self, page) -> str:
        """Join recognized words per block (x-sorted), blocks on new lines."""
        lines = []
        for block in page.blocks:
            sorted_words = sorted(
                block.words, key=lambda w: min(p[0] for p in w.polygon)
            )
            texts = [w.text for w in sorted_words if getattr(w, "text", None)]
            if texts:
                lines.append(" ".join(texts))
        return "\n".join(lines)

    def _extract_word_image(
        self, image: np.ndarray, polygon: np.ndarray
    ) -> Optional[np.ndarray]:
        return crop_axis_aligned(image, polygon)
