"""Fused detect→recognize OCR: the whole page pipeline as one device program.

The classic pipeline (pipeline.py; reference src/manuscript/_pipeline.py)
pays the host↔device link three times per page: detector candidates come
down, word crops go back up, recognition results come down — and the crop
extraction itself runs on the host. On the axon link (~30 ms fixed d2h
latency) that dominates end-to-end latency.

Here the handoff stays in HBM (SURVEY.md §3.1/§7 north star): one jitted
program runs

  normalize → EAST forward → cell decode → candidate compaction →
  parallel LANMS → expansion/rescale/containment/anomaly/axis-align →
  device crop-gather (axis-aligned clamp + white-pad resize, reference
  _pipeline.py:204-221 semantics; MXU matmul formulation) → TRBA encode →
  greedy/beam decode → confidences

so each page costs ONE h2d (the resized uint8 page) and ONE d2h (boxes +
token ids + confidences, ~100 KB). ``predict_many`` additionally rides
``batch_pages`` pages per dispatch through a vmapped variant of the same
program — one upload / dispatch / fetch per chunk, with the next chunk
prepared and dispatched while the current one computes.

``crop_source`` picks where the recognizer's crops come from:

* ``"native"`` (default): a TWO-phase program pair. Phase A is the
  device detect program (EAST → decode → NMS → postprocess) whose only
  d2h is the packed word boxes (~10 KB); the host then slices each
  word's native-resolution region from the original page and applies
  the reference's exact crop semantics (clamped axis-aligned slice +
  cv2 aspect-preserving white-pad resize, _pipeline.py:204-221 /
  transforms.py:62-120), and phase B uploads the fixed-shape crop
  stack (bytes ∝ word count, ≈0.5 MB/page folded) and runs the TRBA
  encoder+decoder on device. Full reference crop quality (the r4 bench
  priced detector-res crops at +0.041 CER) without the k²× full-page
  upload of ``crop_scale``; in ``predict_many`` the phases of adjacent
  chunks overlap, so steady-state throughput still approaches
  max(device compute, link IO).
* ``"device"``: the original ONE-program path — crops are gathered on
  device from the detector-resolution page copy already in HBM
  (``ops/crop_gather.crop_resize_pad_mm``). One h2d + one d2h per page
  and the lowest possible link cost, at a documented crop-resolution
  quality delta. ``crop_scale=k`` (implies this path) uploads a
  (k·target)² page copy to sample crops k× finer.

Documented semantics deltas vs the classic path (all tested):
* ``crop_source="device"`` samples crops from the detector-resolution
  image (device-resident) rather than the original-resolution page —
  bilinear upscale vs cv2 INTER_AREA/LINEAR from full-res (measured
  ~17.7 dB PSNR / 0.71 SSIM vs full-res crops on the bench page;
  ``crop_scale=k`` trades a k²× larger upload for k× finer crop
  sampling). ``crop_source="native"`` has no crop delta;
* LANMS merges chains against the previous candidate rather than the
  running weighted average (ops/lanms_jax.locality_aware_nms_parallel);
* at most ``max_words`` words are recognized per page (score-descending);
  further words keep their boxes but get no text.
"""

from __future__ import annotations

import threading
import time
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .ops.crop_gather import crop_resize_pad_mm
from .ops.decode import compact_candidates, decode_cells_jax
from .ops.image import (
    crop_axis_aligned,
    delta_decode_device,
    delta_encode,
    detector_preprocess_host,
    fold_channels,
    read_image,
    resize_and_pad,
    unfold_channels_device,
)
from .ops.lanms_jax import locality_aware_nms_parallel
from .ops.postprocess_jax import postprocess_boxes_jax
from .ops.boxes import quad_bbox_int
from .ops.reading_order import reading_order_permutation
from .recognizers.charset import decode_tokens
from .recognizers.trba import sequence_confidence
from .types import Block, Page, Word
from .utils.visualize import visualize_page


class FusedOCR:
    """One-program page OCR over native EAST + TRBA wrappers.

    Takes already-constructed wrappers (their variables are device-resident
    and layout-canonicalized) plus the decode knobs; builds and caches the
    fused jit. Thresholds are traced scalars — sweeping them never
    recompiles.
    """

    def __init__(
        self,
        detector,
        recognizer,
        max_words: Union[int, str] = "auto",
        mode: str = "beam",
        beam_size: int = 8,
        alpha: float = 0.9,
        temperature: float = 1.7,
        min_text_size: int = 5,
        batch_pages: int = 4,
        transport: str = "delta",
        fold_gray: bool = True,
        fold_tol: int = 0,
        crop_dtype: Any = jnp.bfloat16,
        capacity_buckets: tuple = (32, 64, 128, 256),
        capacity_headroom: int = 8,
        crop_scale: int = 1,
        crop_source: str = "native",
        mesh=None,
    ):
        """``max_words``: word-capacity slots per page. The TRBA encoder
        runs on EVERY slot (~15 GFLOPs each), so unused slots are pure
        waste; "auto" (default) sizes capacity to the first page seen —
        one count-only device call, then the smallest ``capacity_buckets``
        entry covering the count with ``capacity_headroom`` slack (the
        detector's ``max_boxes`` is shrunk to match). Dropped words are
        detected in-band either way (``last_dropped``); in auto mode an
        overflowing page grows capacity to the next bucket and is
        transparently re-run at full capacity (``last_overflow`` records
        the pre-retry drop count), so auto-sizing never costs recognized
        words — a pinned int capacity keeps boxes and drops text beyond it.
        The 32 bucket exists because the TRBA encoder cost scales with
        slots: capacity 32 vs 64 is ~21% less chunk compute (measured).

        ``fold_gray``: when True (default), a page whose three RGB channels
        are bit-identical — grayscale content stored as RGB, the common
        manuscript-scan case — uploads as ONE channel and is broadcast back
        on device: a lossless 3× cut of the dominant link cost (the A/B in
        ops/image.py:fold_channels measured upload time tracking bytes).
        Color pages upload unchanged; in ``predict_many`` a chunk folds
        only if every page in it folds. ``fold_tol>0`` additionally folds
        near-gray pages (JPEG chroma noise) to channel 0 with per-pixel
        error ≤ tol.

        ``crop_dtype``: matmul dtype of the device crop-gather. bfloat16
        (default) halves the crop-resample time at ≤ ±1 uint8 difference
        (ops/crop_gather.py:crop_resize_pad_mm); pass float32 for exact
        cv2-parity crops.

        ``crop_scale``: source resolution of the device crops. 1 (default)
        samples crops from the detector-resolution image already in HBM; a
        page much larger than ``target_size`` downsamples every word before
        recognition (documented delta vs the reference's full-res host
        crops, _pipeline.py:204-221). ``crop_scale=k`` additionally uploads
        a (k·target_size)² copy of the page and gathers crops from it —
        fixed shape (so no per-page recompiles), k× less downsampling, at
        the cost of a k²× larger upload per page.

        ``mesh``: an optional ``jax.sharding.Mesh`` (parallel.mesh.make_mesh)
        for multi-chip inference. The batched page program's leading page
        axis is sharded over the mesh's 'data' axis and the model weights
        are replicated once at construction, so ``predict_many`` /
        ``process_batch`` throughput scales with chip count — pages are
        embarrassingly parallel, XLA partitions the vmapped program with no
        collectives on the forward path (SURVEY.md §7 step 9).
        ``batch_pages`` is rounded up to a multiple of the data-axis size so
        every device computes the same page count per dispatch; single-page
        ``predict`` and capacity calibration stay on the default device."""
        if mode not in ("greedy", "beam"):
            raise ValueError(f"Unknown mode: {mode}")
        if transport not in ("raw", "delta"):
            raise ValueError(f"Unknown transport: {transport}")
        if crop_source not in ("native", "device"):
            raise ValueError(f"Unknown crop_source: {crop_source!r}")
        if max_words != "auto" and not isinstance(max_words, int):
            raise ValueError(f"max_words must be an int or 'auto': {max_words!r}")
        self.detector = detector
        self.recognizer = recognizer
        self._auto_capacity = max_words == "auto"
        self.max_words = None if self._auto_capacity else max_words
        self.mode = mode
        self.beam_size = beam_size
        self.alpha = alpha
        self.temperature = temperature
        self.min_text_size = min_text_size
        self.batch_pages = batch_pages
        self.transport = transport
        self.fold_gray = fold_gray
        self.fold_tol = fold_tol
        self.crop_dtype = crop_dtype
        self.capacity_buckets = tuple(sorted(capacity_buckets))
        self.capacity_headroom = capacity_headroom
        if not (isinstance(crop_scale, int) and crop_scale >= 1):
            raise ValueError(f"crop_scale must be an int >= 1: {crop_scale!r}")
        self.crop_scale = crop_scale
        # crop_scale only has meaning for device-gathered crops (the native
        # path already crops at full resolution) — it selects that path
        self.crop_source = "device" if crop_scale > 1 else crop_source
        self.mesh = mesh
        self._det_vars_mesh = self._rec_vars_mesh = None
        if mesh is not None:
            from .parallel.mesh import DATA_AXIS, replicate

            n_data = mesh.shape[DATA_AXIS]
            # same page count per device per dispatch
            self.batch_pages = max(
                n_data, -(-self.batch_pages // n_data) * n_data
            )
            self._det_vars_mesh = replicate(detector.variables, mesh)
            self._rec_vars_mesh = replicate(recognizer.variables, mesh)
        self.last_dropped = 0
        # pre-retry drop count of the most recent overflow (the transparent
        # re-run leaves last_dropped == 0)
        self.last_overflow = 0
        self._fn = None
        self._fn_batched = None
        self._count_fns = {}
        # native-crop two-phase programs: one detect program (depends on
        # max_boxes) + recognize programs keyed by word capacity
        self._det_fn = None
        self._det_fn_batched = None
        self._rec_fns = {}
        self._rec_fns_batched = {}
        self._warmed_buckets = set()
        self._warming = set()
        self._warm_thread = None
        self._warm_threads: List[Any] = []
        self._capacity_lock = threading.Lock()

    # ------------------------------------------------------------------

    def _build_program(
        self, stop_after: Optional[str] = None, detect_only: bool = False
    ):
        """Build the single-page device program. ``stop_after`` truncates it
        after the named stage and returns a data-dependent f32 scalar
        instead of the packed result — the stage-profiling hook
        (examples/fused_profile.py) measures cumulative prefixes of the
        EXACT production program rather than a hand-mirrored copy. Stages:
        east_forward, decode_compact, lanms, postprocess_crop, trba_cnn,
        trba_encode, trba_decode(=None, full program minus packing).

        ``detect_only=True`` builds phase A of the native-crop path: the
        program stops after box postprocessing and packs boxes9 (in-band
        validity) + the eligible-word count; word selection and cropping
        then happen on the host at native resolution."""
        det, rec = self.detector, self.recognizer
        east_model, trba_model = det.model, rec.model
        q = det.quantization
        geo_scale = 1.0 / det.score_geo_scale
        max_cands = det.max_candidates
        max_boxes = det.max_boxes
        # snapshot the capacities this program was compiled with — _unpack
        # must keep working even if auto-capacity re-buckets later
        if detect_only:
            self._det_built_nb = max_boxes
        else:
            if self.max_words is None:
                raise RuntimeError(
                    "word capacity unresolved — call calibrate()/predict() "
                    "first (max_words='auto' sizes capacity from the first "
                    "page)"
                )
            self._built_nb = max_boxes
            self._built_nw = self.max_words
        crop_dtype = self.crop_dtype
        expand_w, expand_h = det.expand_ratio_w, det.expand_ratio_h
        axis_aligned = det.axis_aligned_output
        remove_anoms = det.remove_area_anomalies
        anomaly_sigma = det.anomaly_sigma_threshold
        anomaly_min = det.anomaly_min_box_count
        max_words = self.max_words
        min_text = float(self.min_text_size)
        mode = self.mode
        beam_size, alpha, temp = self.beam_size, self.alpha, self.temperature
        max_len, eos_id = rec.max_length, rec.eos_id
        img_h, img_w = rec.img_h, rec.img_w

        transport = self.transport
        crop_scale = self.crop_scale

        def fn(east_vars, trba_vars, u8_img, *rest):
            if crop_scale > 1:
                u8_img_hi, score_thresh, iou_thresh, scale_x, scale_y = rest
            else:
                score_thresh, iou_thresh, scale_x, scale_y = rest
                u8_img_hi = None
            if transport == "delta":
                # invert the host's lossless row-delta (ops/image.py:
                # delta_encode) — see its docstring for the why
                u8_img = delta_decode_device(u8_img)
                if u8_img_hi is not None:
                    u8_img_hi = delta_decode_device(u8_img_hi)
            # channel-folded upload (ops/image.py:fold_channels): the trace
            # sees the 2-D shape, so folded and RGB pages are two jit cache
            # entries of the same program
            if u8_img.ndim == 2:
                u8_img = unfold_channels_device(u8_img)
            if u8_img_hi is not None and u8_img_hi.ndim == 2:
                u8_img_hi = unfold_channels_device(u8_img_hi)
            # ---- detect ----
            x = (u8_img.astype(east_model.dtype) / 255.0 - 0.5) / 0.5
            out = east_model.apply(east_vars, x[None])
            score = out["score"][0, :, :, 0]
            geo = out["geometry"][0]
            if stop_after == "east_forward":
                return score.astype(jnp.float32).sum() + geo.astype(
                    jnp.float32
                ).sum()
            quads, scores, valid = decode_cells_jax(
                score, geo, score_thresh, quantization=q, scale=geo_scale
            )
            cands = compact_candidates(quads, scores, valid, max_cands)
            if stop_after == "decode_compact":
                return cands.astype(jnp.float32).sum()
            merged, count = locality_aware_nms_parallel(
                cands, iou_thresh, max_out=max_boxes
            )
            if stop_after == "lanms":
                return merged.astype(jnp.float32).sum() + count.astype(
                    jnp.float32
                )
            boxes9, bvalid = postprocess_boxes_jax(
                merged,
                count,
                expand_w,
                expand_h,
                scale_x,
                scale_y,
                axis_aligned=axis_aligned,
                remove_anomalies=remove_anoms,
                anomaly_sigma=anomaly_sigma,
                anomaly_min_count=anomaly_min,
            )

            # ---- word selection (original-resolution bboxes) ----
            bq = boxes9[:, :8].reshape(max_boxes, 4, 2)
            x_min = jnp.floor(bq[..., 0].min(axis=1))
            x_max = jnp.floor(bq[..., 0].max(axis=1))
            y_min = jnp.floor(bq[..., 1].min(axis=1))
            y_max = jnp.floor(bq[..., 1].max(axis=1))
            big_enough = ((x_max - x_min) >= min_text) & (
                (y_max - y_min) >= min_text
            )
            if detect_only:
                # phase A of the native-crop path: boxes down (~10 KB),
                # crops later come back UP at native resolution. Validity
                # rides in-band as score −1 like the full program's packing.
                out_boxes = boxes9.at[:, 8].set(
                    jnp.where(bvalid, boxes9[:, 8], -1.0)
                )
                n_eligible = jnp.sum(bvalid & big_enough).astype(jnp.float32)
                return jnp.concatenate([
                    out_boxes.reshape(-1).astype(jnp.float32),
                    n_eligible[None],
                ])
            sel = bvalid & big_enough
            sel = sel & (jnp.cumsum(sel) <= max_words)
            slot = jnp.where(sel, jnp.cumsum(sel) - 1, max_words)
            n_sel = jnp.sum(sel)

            def scatter(vals, fill=0.0, dt=jnp.float32):
                buf = jnp.full((max_words + 1,), fill, dt)
                return buf.at[slot].set(vals)[:max_words]

            src_idx = scatter(
                jnp.arange(max_boxes, dtype=jnp.int32), 0, jnp.int32
            )
            cb_x1 = scatter(x_min / scale_x)
            cb_y1 = scatter(y_min / scale_y)
            cb_x2 = scatter(x_max / scale_x)
            cb_y2 = scatter(y_max / scale_y)
            wvalid = jnp.arange(max_words) < n_sel

            # ---- crop-gather (stays in HBM; MXU matmul formulation) ----
            det_boxes = jnp.stack([cb_x1, cb_y1, cb_x2, cb_y2], axis=1)
            # the detector copy is SQUARE while pages generally aren't:
            # (scale_x, scale_y) corrects the crop canvas geometry so words
            # keep their original aspect (ops/crop_gather._box_geometry;
            # without it every crop is stretched by the page's W/H ratio)
            if u8_img_hi is not None:
                # crop from the higher-res copy (boxes scale with it; the
                # aspect ratio correction is scale-invariant)
                crops = crop_resize_pad_mm(
                    u8_img_hi, det_boxes * float(crop_scale), wvalid,
                    out_h=img_h, out_w=img_w, dtype=crop_dtype,
                    aspect=(scale_x, scale_y),
                )
            else:
                crops = crop_resize_pad_mm(
                    u8_img, det_boxes, wvalid, out_h=img_h, out_w=img_w,
                    dtype=crop_dtype, aspect=(scale_x, scale_y),
                )

            if stop_after == "postprocess_crop":
                return crops.astype(jnp.float32).sum()

            # ---- recognize ----
            xc = (crops.astype(trba_model.dtype) / 255.0 - 0.5) / 0.5
            if stop_after == "trba_cnn":
                # CNN + height-pool only (the encoder minus the BiLSTMs)
                feat = trba_model.apply(
                    trba_vars, xc,
                    method=lambda m, a: jnp.mean(m.cnn(a), axis=1),
                )
                return feat.astype(jnp.float32).sum()
            if stop_after == "trba_encode":
                enc = trba_model.apply(trba_vars, xc, method="encode")
                return enc.astype(jnp.float32).sum()
            if mode == "greedy":
                logits, preds = trba_model.apply(
                    trba_vars, xc, max_len=max_len, method="greedy"
                )
            else:
                logits, preds = trba_model.apply(
                    trba_vars,
                    xc,
                    max_len=max_len,
                    beam_size=beam_size,
                    alpha=alpha,
                    temperature=temp,
                    method="beam",
                )
            preds, confs = sequence_confidence(logits, preds, eos_id)
            if stop_after == "trba_decode":
                return (
                    preds.astype(jnp.float32).sum()
                    + confs.astype(jnp.float32).sum()
                )

            # ---- pack everything into ONE f32 buffer ----
            # The link charges ~30 ms fixed latency per transfer; fetching
            # six arrays costs six round trips. Validity is encoded in-band
            # (invalid box rows get score −1, invalid words src_idx −1).
            # Ints ride as exact f32 VALUES (tokens < vocab ≪ 2²⁴,
            # src_idx ≤ max_boxes) — NOT bitcasts: XLA's f32 pipeline may
            # flush denormals and canonicalize NaNs, which silently zeroes
            # bitcast payloads (observed on XLA:CPU).
            boxes9 = boxes9.at[:, 8].set(
                jnp.where(bvalid, boxes9[:, 8], -1.0)
            )
            src_idx = jnp.where(wvalid, src_idx, -1)
            # total words eligible for recognition (pre-capacity-cap): the
            # host compares it against the recognized count to detect
            # capacity overflow without a second fetch
            n_eligible = jnp.sum(bvalid & big_enough).astype(jnp.float32)
            flat = jnp.concatenate([
                boxes9.reshape(-1).astype(jnp.float32),
                confs.astype(jnp.float32),
                preds.astype(jnp.float32).reshape(-1),
                src_idx.astype(jnp.float32),
                n_eligible[None],
            ])
            return flat

        return fn

    def _unpack(self, flat: np.ndarray, nb: int, nw: int):
        """Host-side inverse of the program's output packing. ``nb``/``nw``
        are the capacities the emitting program was compiled with (passed
        per dispatch: auto-capacity growth may rebuild programs while older
        results are still in flight)."""
        # greedy emits max_len+1 steps, beam max_len (reference model.py
        # _greedy_decode vs _beam_decode loop bounds)
        t = self.recognizer.max_length + (1 if self.mode == "greedy" else 0)
        p = 0
        boxes9 = flat[p : p + nb * 9].reshape(nb, 9); p += nb * 9
        confs = flat[p : p + nw]; p += nw
        preds = (
            np.rint(flat[p : p + nw * t]).astype(np.int32).reshape(nw, t)
        ); p += nw * t
        src_idx = np.rint(flat[p : p + nw]).astype(np.int32); p += nw
        n_eligible = int(np.rint(flat[p]))
        bvalid = boxes9[:, 8] >= 0.0
        wvalid = src_idx >= 0
        return boxes9, bvalid, src_idx, wvalid, preds, confs, n_eligible

    # ---- capacity calibration ------------------------------------------

    def _build_count_program(self, n_thresholds: int):
        """Count-only variant of the page program: ONE EAST forward, then
        decode→NMS→postprocess vmapped over ``n_thresholds`` traced
        thresholds, returning the per-threshold eligible-word counts. One
        dispatch + one tiny fetch replaces the reference-style calibration
        loop of full predict() calls (VERDICT r2: that loop burned the
        link's fresh-transfer budget before the primary measurement)."""
        det = self.detector
        east_model = det.model
        q = det.quantization
        geo_scale = 1.0 / det.score_geo_scale
        max_cands = det.max_candidates
        max_boxes = det.max_boxes
        expand_w, expand_h = det.expand_ratio_w, det.expand_ratio_h
        axis_aligned = det.axis_aligned_output
        remove_anoms = det.remove_area_anomalies
        anomaly_sigma = det.anomaly_sigma_threshold
        anomaly_min = det.anomaly_min_box_count
        min_text = float(self.min_text_size)
        transport = self.transport

        def fn(east_vars, u8_img, threshs, iou_thresh, scale_x, scale_y):
            if transport == "delta":
                u8_img = delta_decode_device(u8_img)
            if u8_img.ndim == 2:  # channel-folded upload
                u8_img = unfold_channels_device(u8_img)
            x = (u8_img.astype(east_model.dtype) / 255.0 - 0.5) / 0.5
            out = east_model.apply(east_vars, x[None])
            score = out["score"][0, :, :, 0]
            geo = out["geometry"][0]

            def count_one(thresh):
                quads, scores, valid = decode_cells_jax(
                    score, geo, thresh, quantization=q, scale=geo_scale
                )
                cands = compact_candidates(quads, scores, valid, max_cands)
                merged, count = locality_aware_nms_parallel(
                    cands, iou_thresh, max_out=max_boxes
                )
                boxes9, bvalid = postprocess_boxes_jax(
                    merged, count, expand_w, expand_h, scale_x, scale_y,
                    axis_aligned=axis_aligned,
                    remove_anomalies=remove_anoms,
                    anomaly_sigma=anomaly_sigma,
                    anomaly_min_count=anomaly_min,
                )
                bq = boxes9[:, :8].reshape(max_boxes, 4, 2)
                big_enough = (
                    (jnp.floor(bq[..., 0].max(axis=1))
                     - jnp.floor(bq[..., 0].min(axis=1))) >= min_text
                ) & (
                    (jnp.floor(bq[..., 1].max(axis=1))
                     - jnp.floor(bq[..., 1].min(axis=1))) >= min_text
                )
                return jnp.sum(bvalid & big_enough).astype(jnp.float32)

            return jax.vmap(count_one)(threshs)

        return jax.jit(fn)

    def _count_words(self, resized, thresholds, scale_x, scale_y):
        key = len(thresholds)
        if key not in self._count_fns:
            self._count_fns[key] = self._build_count_program(key)
        det = self.detector
        counts = self._count_fns[key](
            det.variables,
            jnp.asarray(resized),
            jnp.asarray(thresholds, jnp.float32),
            jnp.float32(det.iou_threshold),
            jnp.float32(scale_x),
            jnp.float32(scale_y),
        )
        return np.rint(np.asarray(counts)).astype(int)

    def calibrate(
        self,
        image,
        thresholds=(0.6, 0.7, 0.8, 0.9, 0.95, 0.99, 0.999),
        target_max_words: int = 250,
    ):
        """Pick the lowest ``score_thresh`` whose eligible-word count is
        ≤ ``target_max_words`` (reference-style calibration) with ONE
        device dispatch, set it on the detector, and — in auto-capacity
        mode — size ``max_words``/``max_boxes`` from the chosen count.
        Returns ``(chosen_thresh, {thresh: count})``."""
        det = self.detector
        img = read_image(image)
        resized = self._encode_transport(
            detector_preprocess_host(img, det.target_size)
        )
        sx = img.shape[1] / det.target_size
        sy = img.shape[0] / det.target_size
        counts = self._count_words(resized, tuple(thresholds), sx, sy)
        chosen, chosen_count = float(thresholds[-1]), int(counts[-1])
        for t, n in zip(thresholds, counts):
            if n <= target_max_words:
                chosen, chosen_count = float(t), int(n)
                break
        det.score_thresh = chosen
        if self._auto_capacity and self.max_words is None:
            self._apply_capacity(chosen_count)
        return chosen, {float(t): int(n) for t, n in zip(thresholds, counts)}

    def _headroom(self, cap: int) -> int:
        # proportional for small buckets (8 of 32 slots would waste 25%);
        # the overflow re-run makes a near-full small bucket cheap to leave
        return min(self.capacity_headroom, max(2, cap // 8))

    def _apply_capacity(self, n_words: int) -> None:
        cap = next(
            (
                c
                for c in self.capacity_buckets
                if n_words <= c - self._headroom(c)
            ),
            self.capacity_buckets[-1],
        )
        self.max_words = cap
        # box capacity scales the (M, M) NMS bound matrix and the per-page
        # d2h payload — size it to the workload too (4× headroom over the
        # word capacity; boxes ≥ words since words are filtered boxes).
        # Sized from the detector's ORIGINAL bound so a capacity grow can
        # re-grow boxes a previous shrink took away.
        det = self.detector
        if not hasattr(det, "_fused_orig_max_boxes"):
            det._fused_orig_max_boxes = det.max_boxes
        det.max_boxes = min(det._fused_orig_max_boxes, max(4 * cap, 256))
        self._fn = self._fn_batched = None
        self._det_fn = self._det_fn_batched = None  # captured old max_boxes
        self._count_fns = {}  # count programs captured the old max_boxes

    def _resolve_capacity(self, resized, scale_x, scale_y) -> None:
        """Auto-capacity, first page: one count-only dispatch at the current
        threshold sizes the compiled capacity before any program builds."""
        if self.max_words is not None:
            return
        det = self.detector
        n = int(
            self._count_words(
                resized, (float(det.score_thresh),), scale_x, scale_y
            )[0]
        )
        self._apply_capacity(n)

    @property
    def program(self):
        if self._fn is None:
            self._fn = jax.jit(self._build_program())
        return self._fn

    @property
    def program_batched(self):
        """The page program vmapped over a leading page axis of size
        ``batch_pages``: one dispatch + ONE d2h round trip per B pages, and
        the latency-bound small-tensor stages (decode, NMS, postprocess)
        amortize across the batch. Weights are broadcast (in_axes=None).

        With a ``mesh``, the page axis is sharded over the 'data' axis
        (weights replicated): XLA partitions the whole vmapped program
        page-parallel — multi-chip inference with zero forward-path
        collectives."""
        if self._fn_batched is None:
            has_hi = self.crop_scale > 1
            in_axes = (
                (None, None, 0, 0, None, None, 0, 0)
                if has_hi
                else (None, None, 0, None, None, 0, 0)
            )
            vf = jax.vmap(self._build_program(), in_axes=in_axes)
            if self.mesh is None:
                self._fn_batched = jax.jit(vf)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from .parallel.mesh import DATA_AXIS

                rep = NamedSharding(self.mesh, P())
                dat = NamedSharding(self.mesh, P(DATA_AXIS))
                in_sh = (
                    (rep, rep, dat, dat, rep, rep, dat, dat)
                    if has_hi
                    else (rep, rep, dat, rep, rep, dat, dat)
                )
                self._fn_batched = jax.jit(
                    vf, in_shardings=in_sh, out_shardings=dat
                )
        return self._fn_batched

    # ---- native-crop two-phase programs --------------------------------

    @property
    def detect_program(self):
        """Phase A of the native-crop path (single page): detect → NMS →
        postprocess, packed boxes9 + eligible count d2h."""
        if self._det_fn is None:
            self._det_fn = jax.jit(self._build_program(detect_only=True))
        return self._det_fn

    @property
    def detect_program_batched(self):
        """Phase A vmapped over ``batch_pages`` pages (page axis sharded
        over the mesh's 'data' axis when one is set, like
        ``program_batched``)."""
        if self._det_fn_batched is None:
            vf = jax.vmap(
                self._build_program(detect_only=True),
                in_axes=(None, None, 0, None, None, 0, 0),
            )
            if self.mesh is None:
                self._det_fn_batched = jax.jit(vf)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from .parallel.mesh import DATA_AXIS

                rep = NamedSharding(self.mesh, P())
                dat = NamedSharding(self.mesh, P(DATA_AXIS))
                self._det_fn_batched = jax.jit(
                    vf,
                    in_shardings=(rep, rep, dat, rep, rep, dat, dat),
                    out_shardings=dat,
                )
        return self._det_fn_batched

    def _build_recognize_program(self, nw: int):
        """Phase B of the native-crop path: a fixed-shape stack of ``nw``
        host-prepared crops (ONE tall uint8 strip, optionally channel-folded
        + row-delta'd like page uploads) → TRBA encode → greedy/beam decode
        → packed (confs, token ids). The strip layout keeps the upload a
        single contiguous transfer and reuses the page transport codecs."""
        rec = self.recognizer
        trba_model = rec.model
        mode = self.mode
        beam_size, alpha, temp = self.beam_size, self.alpha, self.temperature
        max_len, eos_id = rec.max_length, rec.eos_id
        img_h, img_w = rec.img_h, rec.img_w
        transport = self.transport

        def fn(trba_vars, u8_strip):
            if transport == "delta":
                u8_strip = delta_decode_device(u8_strip)
            if u8_strip.ndim == 2:  # channel-folded upload
                u8_strip = unfold_channels_device(u8_strip)
            crops = u8_strip.reshape(nw, img_h, img_w, 3)
            xc = (crops.astype(trba_model.dtype) / 255.0 - 0.5) / 0.5
            if mode == "greedy":
                logits, preds = trba_model.apply(
                    trba_vars, xc, max_len=max_len, method="greedy"
                )
            else:
                logits, preds = trba_model.apply(
                    trba_vars, xc, max_len=max_len, beam_size=beam_size,
                    alpha=alpha, temperature=temp, method="beam",
                )
            preds, confs = sequence_confidence(logits, preds, eos_id)
            return jnp.concatenate([
                confs.astype(jnp.float32),
                preds.astype(jnp.float32).reshape(-1),
            ])

        return fn

    def _rec_program(self, nw: int):
        if nw not in self._rec_fns:
            self._rec_fns[nw] = jax.jit(self._build_recognize_program(nw))
        return self._rec_fns[nw]

    def _rec_program_batched(self, nw: int):
        if nw not in self._rec_fns_batched:
            vf = jax.vmap(
                self._build_recognize_program(nw), in_axes=(None, 0)
            )
            if self.mesh is None:
                self._rec_fns_batched[nw] = jax.jit(vf)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from .parallel.mesh import DATA_AXIS

                rep = NamedSharding(self.mesh, P())
                dat = NamedSharding(self.mesh, P(DATA_AXIS))
                self._rec_fns_batched[nw] = jax.jit(
                    vf, in_shardings=(rep, dat), out_shardings=dat
                )
        return self._rec_fns_batched[nw]

    # ---- native-crop host stages ---------------------------------------

    def _unpack_detect(self, flat: np.ndarray, nb: int):
        boxes9 = flat[: nb * 9].reshape(nb, 9)
        n_eligible = int(np.rint(flat[nb * 9]))
        bvalid = boxes9[:, 8] >= 0.0
        return boxes9, bvalid, n_eligible

    def _unpack_rec(self, flat: np.ndarray, nw: int):
        t = self.recognizer.max_length + (1 if self.mode == "greedy" else 0)
        confs = flat[:nw]
        preds = (
            np.rint(flat[nw : nw + nw * t]).astype(np.int32).reshape(nw, t)
        )
        return confs, preds

    def _eligible_rows(self, boxes9: np.ndarray, bvalid: np.ndarray):
        """Host mirror of the device program's word-selection predicate
        (floor'd axis-aligned extent ≥ min_text_size, row order) — both run
        on the same f32 boxes, so the selections are identical."""
        bq = boxes9[:, :8].reshape(-1, 4, 2)
        x_min = np.floor(bq[..., 0].min(axis=1))
        x_max = np.floor(bq[..., 0].max(axis=1))
        y_min = np.floor(bq[..., 1].min(axis=1))
        y_max = np.floor(bq[..., 1].max(axis=1))
        big = ((x_max - x_min) >= self.min_text_size) & (
            (y_max - y_min) >= self.min_text_size
        )
        return np.nonzero(bvalid & big)[0]

    def _native_capacity_for(self, n_eligible: int) -> int:
        """Word capacity for a native-path dispatch. In auto mode an
        overflowing page grows ``max_words`` to the covering bucket BEFORE
        phase B ever runs — unlike the device path's re-run, growth here
        costs one extra phase-B compile, never a second detection or page
        upload."""
        with self._capacity_lock:  # crop stages may overlap (predict_many)
            nw = self.max_words
            if n_eligible > nw and self._auto_capacity:
                grown = next(
                    (
                        c
                        for c in self.capacity_buckets
                        if c > nw and n_eligible <= c - self._headroom(c)
                    ),
                    self.capacity_buckets[-1],
                )
                if grown > nw:
                    self.last_overflow = n_eligible - nw
                    print(
                        f"[FusedOCR] word capacity {nw} < {n_eligible} "
                        f"eligible words — growing to {grown} (native path: "
                        "only the recognize stage re-shapes)"
                    )
                    self.max_words = grown
                    nw = grown
        return nw

    def _chunk_bucket(self, max_elig: int) -> int:
        """Chunk-local phase-B capacity: the smallest bucket covering this
        chunk's densest page, capped at the global bound. A single dense
        page grows ``max_words`` permanently (auto mode), but later sparse
        chunks shouldn't keep paying the grown bucket's strip upload,
        padded recognizer compute, and result-fetch bytes — the tunneled
        link is the native path's bottleneck, and strip bytes scale with
        the bucket. Programs are cached per bucket, so revisiting a small
        bucket after growth costs nothing."""
        cap = self._native_capacity_for(max_elig)  # may grow the bound
        nw = next((c for c in self.capacity_buckets if c >= max_elig), cap)
        return min(nw, cap)

    def _native_strip(self, img: np.ndarray, boxes9: np.ndarray, rows, nw):
        """Build one page's phase-B input: for each selected word, the
        reference's exact crop semantics — clamped axis-aligned slice of
        the ORIGINAL-resolution page (_pipeline.py:204-221) + cv2
        aspect-preserving white-pad resize (transforms.py:62-120) — stacked
        into one (nw·img_h, img_w, 3) uint8 strip. Unused slots stay
        white (the recognizer decodes them to empty; their outputs are
        dropped at unpack)."""
        rec = self.recognizer
        h_c, w_c = rec.img_h, rec.img_w
        strip = np.full((nw, h_c, w_c, 3), 255, np.uint8)
        for s, r in enumerate(rows):
            poly = boxes9[int(r), :8].reshape(4, 2).astype(np.int32)
            region = crop_axis_aligned(img, poly)
            if region is not None and region.size > 0:
                strip[s] = resize_and_pad(region, h_c, w_c)
        return strip.reshape(nw * h_c, w_c, 3)

    def _predict_native(self, image, vis: bool = False):
        """Single-page native-crop prediction: phase A dispatch + box
        fetch, host native-res crops, phase B dispatch + text fetch."""
        det, rec = self.detector, self.recognizer
        img = read_image(image)
        resized = self._encode_transport(
            detector_preprocess_host(img, det.target_size)
        )
        sx = img.shape[1] / det.target_size
        sy = img.shape[0] / det.target_size
        self._resolve_capacity(resized, sx, sy)
        dfn = self.detect_program  # build before reading _det_built_nb
        nb = self._det_built_nb
        flat = np.asarray(
            dfn(
                det.variables,
                rec.variables,
                jnp.asarray(resized),
                jnp.float32(det.score_thresh),
                jnp.float32(det.iou_threshold),
                jnp.float32(sx),
                jnp.float32(sy),
            )
        )
        boxes9, bvalid, _ = self._unpack_detect(flat, nb)
        rows_all = self._eligible_rows(boxes9, bvalid)
        nw = self._chunk_bucket(len(rows_all))
        rows = rows_all[:nw]
        self.last_dropped = len(rows_all) - len(rows)
        if self.last_dropped > 0:
            self.last_overflow = self.last_dropped
            print(
                f"[FusedOCR] word capacity {nw} dropped "
                f"{self.last_dropped}/{len(rows_all)} words on this page"
            )
        strip = self._encode_transport(
            self._native_strip(img, boxes9, rows, nw)
        )
        rflat = np.asarray(
            self._rec_program(nw)(rec.variables, jnp.asarray(strip))
        )
        confs, preds = self._unpack_rec(rflat, nw)
        src_idx = np.full(nw, -1, np.int32)
        src_idx[: len(rows)] = rows
        return self._build_page_result(
            img, boxes9, bvalid, src_idx, src_idx >= 0, preds, confs, vis
        )

    # ------------------------------------------------------------------

    def _encode_transport(self, resized: np.ndarray) -> np.ndarray:
        """Encode ONE page for the link: optional lossless channel fold
        (grayscale-as-RGB pages upload one channel), then row delta."""
        if self.fold_gray:
            folded = fold_channels(resized, self.fold_tol)
            if folded is not None:
                resized = folded
        return (
            delta_encode(resized) if self.transport == "delta" else resized
        )

    def _encode_stack(self, pages: list) -> list:
        """Encode a chunk of same-size pages. ``np.stack`` needs one shape,
        so the chunk channel-folds only if EVERY page folds; a single color
        page keeps the whole chunk RGB."""
        if self.fold_gray:
            folded = [fold_channels(p, self.fold_tol) for p in pages]
            if all(f is not None for f in folded):
                pages = folded
        if self.transport == "delta":
            pages = [delta_encode(p) for p in pages]
        return pages

    def _dispatch(self, image) -> tuple:
        """Read + resize + upload one page; returns (orig_img, device outs)."""
        det = self.detector
        img = read_image(image)
        resized = self._encode_transport(
            detector_preprocess_host(img, det.target_size)
        )
        orig_h, orig_w = img.shape[:2]
        self._resolve_capacity(
            resized, orig_w / det.target_size, orig_h / det.target_size
        )
        hi = ()
        if self.crop_scale > 1:
            hi = (
                jnp.asarray(
                    self._encode_transport(
                        detector_preprocess_host(
                            img, self.crop_scale * det.target_size
                        )
                    )
                ),
            )
        outs = self.program(
            det.variables,
            self.recognizer.variables,
            jnp.asarray(resized),
            *hi,
            jnp.float32(det.score_thresh),
            jnp.float32(det.iou_threshold),
            jnp.float32(orig_w / det.target_size),
            jnp.float32(orig_h / det.target_size),
        )
        return img, outs, (self._built_nb, self._built_nw)

    def _finish(self, img, outs, vis: bool, meta=None, _retried: bool = False):
        nb, nw = meta if meta is not None else (self._built_nb, self._built_nw)
        boxes9, bvalid, src_idx, wvalid, preds, confs, n_eligible = (
            self._unpack(np.asarray(outs), nb, nw)
        )
        rec = self.recognizer

        # capacity overflow: words beyond max_words kept their boxes but got
        # no text. In auto mode re-bucket upward and transparently RE-RUN
        # this page at the grown capacity (one extra dispatch, only on
        # density jumps) — auto-sizing must never cost recognized words.
        self.last_dropped = max(0, n_eligible - int(wvalid.sum()))
        if self.last_dropped > 0:
            self.last_overflow = self.last_dropped
            print(
                f"[FusedOCR] word capacity {nw} dropped "
                f"{self.last_dropped}/{n_eligible} words on this page"
                + (" — growing capacity and re-running it"
                   if self._auto_capacity and not _retried else "")
            )
            if self._auto_capacity:
                grown = next(
                    (
                        c
                        for c in self.capacity_buckets
                        if c > nw
                        and n_eligible <= c - self._headroom(c)
                    ),
                    self.capacity_buckets[-1],
                )
                if grown > max(nw, self.max_words or 0):
                    self.max_words = grown
                    self._fn = self._fn_batched = None
                    if img is not None and not _retried:
                        img2, outs2, meta2 = self._dispatch(img)
                        return self._finish(
                            img2, outs2, vis, meta2, _retried=True
                        )

        return self._build_page_result(
            img, boxes9, bvalid, src_idx, wvalid, preds, confs, vis
        )

    def _build_page_result(
        self, img, boxes9, bvalid, src_idx, wvalid, preds, confs, vis: bool
    ):
        """Boxes + recognition slots → a Page DTO (shared by the one-program
        and native-crop paths): build Words from valid box rows, attach
        texts/confidences by the slot→row mapping, apply reading order."""
        rec = self.recognizer
        words: List[Word] = []
        row_to_word = {}
        for row in np.nonzero(bvalid)[0]:
            quad = boxes9[row]
            word = Word(
                polygon=quad[:8].reshape(4, 2).tolist(),
                detection_confidence=float(np.clip(quad[8], 0.0, 1.0)),
            )
            row_to_word[int(row)] = word
            words.append(word)

        n_rec = int(wvalid.sum())
        for s in range(n_rec):
            word = row_to_word.get(int(src_idx[s]))
            if word is None:  # pragma: no cover — selection ⊆ valid rows
                continue
            word.text = decode_tokens(
                preds[s], rec.itos, rec.pad_id, rec.eos_id, rec.blank_id
            )
            word.recognition_confidence = float(np.clip(confs[s], 0.0, 1.0))

        if words:
            boxes = [
                quad_bbox_int(np.asarray(w.polygon, dtype=np.int32))
                for w in words
            ]
            perm = reading_order_permutation(boxes)
            words = [words[i] for i in perm]
        page = Page(blocks=[Block(words=words)])
        if vis:
            pil = Image.fromarray(np.asarray(img)) if not isinstance(
                img, Image.Image
            ) else img
            return page, visualize_page(pil, page, show_order=True)
        return page

    # ------------------------------------------------------------------

    def predict(
        self,
        image: Union[str, np.ndarray, Image.Image],
        vis: bool = False,
        profile: bool = False,
    ):
        t0 = time.time()
        if self.crop_source == "native":
            result = self._predict_native(image, vis)
        else:
            img, outs, meta = self._dispatch(image)
            result = self._finish(img, outs, vis, meta)
        if profile:
            print(f"Fused pipeline total: {time.time() - t0:.3f}s")
        return result

    def _prepare_chunk(self, chunk) -> tuple:
        """Host side of a chunk dispatch: read + resize + transport-encode
        up to ``batch_pages`` pages into ONE stacked tensor, and (single-
        device path) start its h2d upload. Pure host + transfer work with
        no jit/program state — safe to run in a background thread so the
        next chunk's CPU work and upload hide behind the current chunk's
        device compute and result fetch (``predict_many`` does exactly
        that; on the tunneled link this is the difference between
        host-serial ~146 ms/chunk and ~max(compute, IO)). Short chunks are
        padded by repeating the last page (padding rows are dropped at
        unpack)."""
        det = self.detector
        b = self.batch_pages
        imgs, resized, resized_hi, sx, sy = [], [], [], [], []
        for image in chunk:
            img = read_image(image)
            imgs.append(img)
            resized.append(detector_preprocess_host(img, det.target_size))
            if self.crop_scale > 1:
                resized_hi.append(
                    detector_preprocess_host(
                        img, self.crop_scale * det.target_size
                    )
                )
            sx.append(img.shape[1] / det.target_size)
            sy.append(img.shape[0] / det.target_size)
        for _ in range(b - len(chunk)):
            resized.append(resized[-1])
            if resized_hi:
                resized_hi.append(resized_hi[-1])
            sx.append(sx[-1])
            sy.append(sy[-1])
        # encode as a chunk (channel fold is all-or-none per stack)
        resized = self._encode_stack(resized)
        if resized_hi:
            resized_hi = self._encode_stack(resized_hi)
        first_page, first_sx, first_sy = resized[0], sx[0], sy[0]
        stack = np.stack(resized)
        hi = (np.stack(resized_hi),) if self.crop_scale > 1 else ()
        if self.mesh is None:
            # start the upload now (async h2d); the jit call then receives
            # committed buffers instead of blocking on the transfer.
            # mesh path keeps uncommitted numpy: jit places each page shard
            # directly on its device per in_shardings (no staging copy)
            stack = jax.device_put(stack)
            hi = tuple(jax.device_put(h) for h in hi)
        return (
            imgs, stack, hi,
            np.asarray(sx, np.float32), np.asarray(sy, np.float32),
            (first_page, first_sx, first_sy),
        )

    def _dispatch_prepared(self, prep) -> tuple:
        """Dispatch one prepared chunk: resolve capacity (may rebuild the
        program on the first page) and enqueue the vmapped program."""
        det = self.detector
        imgs, stack, hi, sx, sy, first = prep
        self._resolve_capacity(*first)
        dvars = (
            (self._det_vars_mesh, self._rec_vars_mesh)
            if self.mesh is not None
            else (det.variables, self.recognizer.variables)
        )
        outs = self.program_batched(
            *dvars,
            self._stage_sharded(stack),
            *(self._stage_sharded(h) for h in hi),
            np.float32(det.score_thresh),
            np.float32(det.iou_threshold),
            self._stage_sharded(sx),
            self._stage_sharded(sy),
        )
        return imgs, outs, (self._built_nb, self._built_nw)

    def _dispatch_chunk(self, chunk) -> tuple:
        """Read + resize + upload up to ``batch_pages`` pages as ONE stacked
        tensor and dispatch the vmapped program: one h2d, one dispatch, one
        d2h per chunk."""
        return self._dispatch_prepared(self._prepare_chunk(chunk))

    def _finish_chunk(self, imgs, outs, vis: bool, meta) -> List[Any]:
        flat = self._fetch(outs)  # (B, page_flat) — single d2h
        return [
            self._finish(img, flat[i], vis, meta)
            for i, img in enumerate(imgs)
        ]

    # ---- native-crop chunk stages (three-stage software pipeline) ------

    def _dispatch_detect_prepared(self, prep) -> tuple:
        """Native stage 1 (main thread): dispatch phase A for one prepared
        chunk. Only ``max_boxes`` shapes this program, so capacity growth
        mid-run never re-detects."""
        det = self.detector
        imgs, stack, _hi, sx, sy, first = prep
        self._resolve_capacity(*first)
        dvars = (
            (self._det_vars_mesh, self._rec_vars_mesh)
            if self.mesh is not None
            else (det.variables, self.recognizer.variables)
        )
        dfn = self.detect_program_batched  # build before _det_built_nb
        outs = dfn(
            *dvars,
            self._stage_sharded(stack),
            np.float32(det.score_thresh),
            np.float32(det.iou_threshold),
            self._stage_sharded(sx),
            self._stage_sharded(sy),
        )
        return imgs, outs, self._det_built_nb

    def _crop_stage(self, imgs, outs, nb) -> tuple:
        """Native stage 2 (background thread): fetch the chunk's boxes
        (blocking d2h — releases the GIL), select words, slice + resize the
        native-resolution crops (cv2), transport-encode and start the crop
        stack's upload. Runs concurrently with the device computing the
        NEXT chunk's phase A and the main thread's other dispatches."""
        flat = self._fetch(outs)  # (B, nb*9+1)
        boxes_list, rows_all_list = [], []
        max_elig = 0
        for i in range(len(imgs)):
            boxes9, bvalid, _ = self._unpack_detect(flat[i], nb)
            boxes_list.append(boxes9)
            rows_all = self._eligible_rows(boxes9, bvalid)
            rows_all_list.append(rows_all)
            max_elig = max(max_elig, len(rows_all))
        nw = self._chunk_bucket(max_elig)
        rows_used, strips = [], []
        dropped = 0
        for i in range(len(imgs)):
            rows = rows_all_list[i][:nw]
            dropped = max(dropped, len(rows_all_list[i]) - len(rows))
            rows_used.append(rows)
            strips.append(
                self._native_strip(imgs[i], boxes_list[i], rows, nw)
            )
        for _ in range(self.batch_pages - len(imgs)):  # pad short chunks
            strips.append(strips[-1])
        strips = self._encode_stack(strips)
        stack = np.stack(strips)
        if self.mesh is None:
            stack = jax.device_put(stack)  # start the h2d now
        else:
            stack = self._stage_sharded(stack)
        return imgs, boxes_list, rows_used, stack, nw, dropped

    def _dispatch_rec_chunk(self, crop_res) -> tuple:
        """Native stage 3 (main thread): dispatch phase B on the prepared
        crop stack. Runs in chunk order, so it also publishes the
        diagnostics ``last_dropped``/``last_overflow`` (finish stages may
        overlap) and prints the same capacity-drop warning the single-page
        and device paths do."""
        imgs, boxes_list, rows_used, stack, nw, dropped = crop_res
        self.last_dropped = dropped
        if dropped > 0:
            self.last_overflow = dropped
            print(
                f"[FusedOCR] word capacity {nw} dropped up to {dropped} "
                "words per page in this chunk"
            )
        rvars = (
            self._rec_vars_mesh
            if self.mesh is not None
            else self.recognizer.variables
        )
        outs = self._rec_program_batched(nw)(rvars, stack)
        return imgs, boxes_list, rows_used, outs, nw, dropped

    def _finish_rec_chunk(self, rec_res, vis: bool) -> List[Any]:
        imgs, boxes_list, rows_used, outs, nw, dropped = rec_res
        flat = self._fetch(outs)  # (B, rec_flat) — single d2h
        pages = []
        for i, img in enumerate(imgs):
            confs, preds = self._unpack_rec(flat[i], nw)
            boxes9 = boxes_list[i]
            src_idx = np.full(nw, -1, np.int32)
            src_idx[: len(rows_used[i])] = rows_used[i]
            pages.append(
                self._build_page_result(
                    img, boxes9, boxes9[:, 8] >= 0.0, src_idx,
                    src_idx >= 0, preds, confs, vis,
                )
            )
        return pages

    # ---- multi-host plumbing -------------------------------------------

    def _stage_sharded(self, arr):
        """Host array → input for a data-sharded jit argument. Single
        process: return the numpy as-is (jit's ``in_shardings`` places
        each page shard directly, no staging copy). Multi-process (mesh
        spans hosts): every process holds the SAME full host array, so
        build the global array via callback — each process's devices pull
        only their own page rows."""
        if self.mesh is None or jax.process_count() == 1:
            return arr

        from .parallel.mesh import data_sharding

        sh = data_sharding(self.mesh, np.ndim(arr))
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    def _fetch(self, outs) -> np.ndarray:
        """Device results → host numpy. Multi-process sharded outputs are
        allgathered so every process can build every page (the buffers are
        ~100 KB/page — the collective is noise next to the compute)."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(outs, tiled=True)
            )
        return np.asarray(outs)

    # ---- capacity-bucket pre-warming -----------------------------------

    def warm_next_bucket(self, block: bool = False):
        """Pre-compile the NEXT capacity bucket's recognize programs in a
        background thread (VERDICT r4 task 8). Auto-capacity growth on the
        first dense page otherwise pays a cold phase-B compile on the hot
        path — seconds of added latency on a production request. Phase A
        is capacity-independent on the native path, so warming the next
        bucket's batched recognize program (both the channel-folded and
        RGB strip variants) makes an overflow re-shape compile-free. The
        warm EXECUTES the jitted programs on zero inputs (one tiny
        dispatch each) because only a real call populates jit's dispatch
        cache. Also warms any SMALLER buckets not yet compiled: chunk-local
        bucket selection (``_chunk_bucket``) can revisit a small bucket
        after growth, and that bucket's batched program may never have run
        if capacity grew before the first dispatch at the old size.
        Idempotent per bucket — a bucket is marked warmed only AFTER its
        compile succeeds, so a failed warm retries on the next call.
        Returns the warmer thread, or None when there is nothing to warm
        (pinned capacity — it never grows — capacity unresolved,
        device-crop path, multi-process mesh — a threaded sharded dispatch
        would desync the processes' global program order — or everything
        already warmed/in flight). The thread is a daemon: a process
        exiting while a warm compile is in flight can abort noisily, so
        callers with a shutdown path should join ``_warm_threads`` briefly
        (OCRServer does)."""
        if (
            not self._auto_capacity
            or self.max_words is None
            or self.crop_source != "native"
            or jax.process_count() > 1
        ):
            return None
        nxt = next(
            (c for c in self.capacity_buckets if c > self.max_words), None
        )
        targets = [
            c
            for c in self.capacity_buckets
            if (nxt is None or c <= nxt)
            and c not in self._warmed_buckets
            and c not in self._warming
        ]
        if not targets:
            return None
        self._warming.update(targets)

        def _warm(buckets=tuple(targets)):
            rec = self.recognizer
            h, w = rec.img_h, rec.img_w
            for nw in buckets:
                try:
                    fnb = self._rec_program_batched(nw)
                    rvars = (
                        self._rec_vars_mesh
                        if self.mesh is not None
                        else rec.variables
                    )
                    for shape in (
                        (self.batch_pages, nw * h, w),  # channel-folded
                        (self.batch_pages, nw * h, w, 3),  # RGB strip
                    ):
                        stack = np.zeros(shape, np.uint8)
                        if self.mesh is None:
                            # committed like _crop_stage's input — an
                            # uncommitted warm array would miss the jit
                            # dispatch cache the real call keys on
                            stack = jax.device_put(stack)
                        np.asarray(fnb(rvars, stack))
                    self._warmed_buckets.add(nw)
                except Exception as exc:  # pragma: no cover — keep prod up
                    print(f"[FusedOCR] bucket warmer failed: {exc!r}")
                finally:
                    self._warming.discard(nw)

        t = threading.Thread(
            target=_warm, name=f"fused-warm-{targets[-1]}", daemon=True
        )
        t.start()
        self._warm_thread = t
        self._warm_threads = [
            w for w in self._warm_threads if w.is_alive()
        ] + [t]
        if block:
            t.join()
        return t

    # ---- async chunk API (serving overlap) -----------------------------

    def start_batch(self, images: List[Any]):
        """Begin one chunk asynchronously: host prep + device dispatch of
        everything that does NOT require waiting on device results. The
        serving layer calls this from its assembler thread so batch N+1's
        decode/resize/upload and phase-A dispatch overlap batch N's device
        compute and result fetch (VERDICT r4 task 3); ``finish_batch``
        blocks for the results. One start/finish pair per call, FIFO;
        a batch larger than ``batch_pages`` is split into per-chunk
        dispatches internally (the device programs are shaped for
        ``batch_pages`` pages — a caller-side batcher, e.g. OCRServer
        with a larger ``batch_pages`` override, must not leak its batch
        size into the program shape)."""
        b = max(1, self.batch_pages)
        if len(images) > b:
            return (
                "multi",
                [
                    self.start_batch(images[i : i + b])
                    for i in range(0, len(images), b)
                ],
            )
        prep = self._prepare_chunk(images)
        if self.crop_source == "native":
            return ("native", self._dispatch_detect_prepared(prep))
        return ("device", self._dispatch_prepared(prep))

    def finish_batch(self, handle) -> List[Any]:
        """Complete a ``start_batch`` chunk: block on device results (and,
        on the native path, run the crop stage + phase B) and build pages."""
        kind, payload = handle
        if kind == "multi":
            out: List[Any] = []
            for sub in payload:
                out.extend(self.finish_batch(sub))
            return out
        if kind == "native":
            rec = self._dispatch_rec_chunk(self._crop_stage(*payload))
            return self._finish_rec_chunk(rec, vis=False)
        imgs, outs, meta = payload
        return self._finish_chunk(imgs, outs, False, meta)

    def _predict_many_native(
        self, images, vis: bool, queue_depth: int
    ) -> List[Any]:
        """Chunked native-crop inference as a FOUR-stage software pipeline:
        page prep (thread A) → phase A dispatch (main) → box fetch + cv2
        crops + crop upload (thread B) → phase B dispatch (main) → result
        fetch + page build (thread C). The main thread only dispatches —
        every blocking link transfer lives in a background thread — so in
        steady state chunk i's host work and all three link legs hide
        behind the device computing chunks i±1, and the extra round trip
        the two-phase split adds costs latency, not throughput. (On-chip
        stage profile, 4-page chunks, tunneled v5e: prep ≈80 ms, crop
        stage ≈140 ms, result fetch ≈90 ms vs ≈80 ms device compute —
        main-thread-blocking finishes alone cost ~90 ms/chunk before the
        fourth stage existed.)"""
        from concurrent.futures import ThreadPoolExecutor

        b = max(1, self.batch_pages)
        chunks = [images[i : i + b] for i in range(0, len(images), b)]
        n = len(chunks)
        results: List[Any] = []
        if self.mesh is not None and jax.process_count() > 1:
            # Multi-controller SPMD requires every process to launch the
            # same global computations (and allgathers) in the same order;
            # background threads would make the interleaving of chunk i's
            # crop/finish collectives nondeterministic across processes.
            # Run the stages strictly serially per chunk instead — the
            # overlap only hides single-host link latency anyway.
            for chunk in chunks:
                det = self._dispatch_detect_prepared(
                    self._prepare_chunk(chunk)
                )
                rec = self._dispatch_rec_chunk(self._crop_stage(*det))
                results.extend(self._finish_rec_chunk(rec, vis))
            return results
        window = queue_depth + 1
        # Two workers in the crop and finish stages: each stage's body is
        # an internally-serial chain of link legs (box d2h → cv2 → strip
        # h2d; result d2h → page build), so with one worker the pipeline
        # period equals that chain's full latency (~160 ms/chunk on the
        # tunneled v5e vs ~80 ms device compute). With two, consecutive
        # chunks' chains overlap and the period drops toward the longest
        # single leg. Capacity growth is lock-guarded; finish publishes
        # nothing on self, and ordering is restored via fin_f[i].
        with ThreadPoolExecutor(max_workers=1) as prep_ex, \
                ThreadPoolExecutor(max_workers=2) as crop_ex, \
                ThreadPoolExecutor(max_workers=2) as fin_ex:
            prep_f, crop_f, fin_f = {}, {}, {}
            next_prep = 0

            def fill_preps(upto: int) -> None:
                nonlocal next_prep
                while next_prep < min(n, upto):
                    prep_f[next_prep] = prep_ex.submit(
                        self._prepare_chunk, chunks[next_prep]
                    )
                    next_prep += 1

            for i in range(n):
                fill_preps(i + window)
                # Dispatch chunk i's phase A FIRST: the detect program
                # enters the device queue before the host blocks on chunk
                # i-1's crop stage (box d2h + cv2 crops + strip h2d), so
                # that round trip hides behind detect compute instead of
                # idling the device. (Dispatch-order on device: det_i,
                # then rec_{i-1} — phase B buffers only depend on their
                # own inputs, and det_i's box fetch only waits on det_i's
                # definition event, so neither delays the other's fetch.)
                det_i = self._dispatch_detect_prepared(
                    prep_f.pop(i).result()
                )
                # Submit chunk i's crop stage BEFORE blocking on chunk
                # i-1's: with two crop workers the chains overlap — i's
                # box fetch rides out det_i's compute while i-1's strip
                # upload drains.
                crop_f[i] = crop_ex.submit(self._crop_stage, *det_i)
                if i >= 1:
                    rec = self._dispatch_rec_chunk(
                        crop_f.pop(i - 1).result()
                    )
                    fin_f[i - 1] = fin_ex.submit(
                        self._finish_rec_chunk, rec, vis
                    )
                    # Backpressure: cap the finish backlog like the device
                    # path caps in-flight chunks — otherwise a slow link
                    # lets pending finishes pin every chunk's full-res
                    # pages and device buffers for the whole run.
                    while len(fin_f) > queue_depth:
                        j = min(fin_f)
                        results.extend(fin_f.pop(j).result())
            rec = self._dispatch_rec_chunk(crop_f.pop(n - 1).result())
            fin_f[n - 1] = fin_ex.submit(self._finish_rec_chunk, rec, vis)
            for i in sorted(fin_f):
                results.extend(fin_f[i].result())
        return results

    def predict_many(
        self,
        images: List[Union[str, np.ndarray, Image.Image]],
        vis: bool = False,
        profile: bool = False,
        queue_depth: int = 2,
    ) -> List[Any]:
        """OCR many pages: ``batch_pages`` pages ride one device program
        (one upload, one dispatch, one result fetch per chunk), and up to
        ``queue_depth`` chunks stay in flight. Chunk PREPARATION (read,
        resize, transport-encode, h2d upload — ``_prepare_chunk``) runs in
        one background thread: its CPU work overlaps the main thread's
        blocking d2h result fetches (both release the GIL during link IO),
        so the steady state approaches max(device compute, link IO) per
        chunk instead of their sum. Measured on the tunneled v5e: host
        preprocess 47 ms + transfers per 4-page chunk were fully serial
        before (≈146 ms/chunk against 80 ms device compute)."""
        t0 = time.time()
        results: List[Any] = []
        if self.crop_source == "native" and images:
            results = self._predict_many_native(images, vis, queue_depth)
        elif self.batch_pages <= 1:
            pending: List[tuple] = []
            for image in images:
                pending.append(self._dispatch(image))
                if len(pending) > queue_depth:
                    img, outs, meta = pending.pop(0)
                    results.append(self._finish(img, outs, vis, meta))
            for img, outs, meta in pending:
                results.append(self._finish(img, outs, vis, meta))
        else:
            from concurrent.futures import ThreadPoolExecutor

            b = self.batch_pages
            chunks = [images[i : i + b] for i in range(0, len(images), b)]
            in_flight: List[tuple] = []
            with ThreadPoolExecutor(max_workers=1) as ex:
                preps = []
                nxt = 0
                while nxt < len(chunks) and len(preps) <= queue_depth:
                    preps.append(ex.submit(self._prepare_chunk, chunks[nxt]))
                    nxt += 1
                while preps:
                    in_flight.append(
                        self._dispatch_prepared(preps.pop(0).result())
                    )
                    if nxt < len(chunks):
                        preps.append(
                            ex.submit(self._prepare_chunk, chunks[nxt])
                        )
                        nxt += 1
                    if len(in_flight) > queue_depth:
                        imgs, outs, meta = in_flight.pop(0)
                        results.extend(
                            self._finish_chunk(imgs, outs, vis, meta)
                        )
            for imgs, outs, meta in in_flight:
                results.extend(self._finish_chunk(imgs, outs, vis, meta))
        if profile:
            dt = time.time() - t0
            print(
                f"Fused batch: {len(images)} pages in {dt:.3f}s "
                f"({len(images) / max(dt, 1e-9):.2f} pages/s)"
            )
        return results
