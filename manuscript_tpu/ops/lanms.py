"""Locality-aware NMS — host path.

Semantics match the reference pipeline (reference:
src/manuscript/detectors/_east/lanms.py:133-207): boxes sorted by x0 are
sequentially merged with the running box whenever quad IoU exceeds the
threshold (score-weighted vertex average after vertex-order normalization),
then a standard greedy NMS pass runs over the merged candidates.

Two host implementations share this module's API:

* a pure-numpy implementation (always available, the parity reference), and
* a C++ implementation (``native/lanms.cpp``) loaded via ctypes — the fast
  path used by the detector; it replaces the reference's Numba JIT kernels.

``locality_aware_nms`` dispatches to C++ when the shared library is present.
The on-device JAX variant lives in ``manuscript_tpu.ops.lanms_jax``.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .geometry import normalize_polygon, should_merge

_EMPTY = np.zeros((0, 9), dtype=np.float32)


def standard_nms(
    polys, scores, iou_threshold: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy score-descending NMS over quads. Returns kept (polys, scores)."""
    polys_arr = np.ascontiguousarray(polys, dtype=np.float64)
    scores_arr = np.ascontiguousarray(scores, dtype=np.float64)
    if polys_arr.size == 0:
        return polys_arr, scores_arr
    order = np.argsort(-scores_arr)
    n = order.shape[0]
    # spatial prior: disjoint bboxes ⇒ IoU 0, skip the polygon clipping
    x0 = polys_arr[:, :, 0].min(1); x1 = polys_arr[:, :, 0].max(1)
    y0 = polys_arr[:, :, 1].min(1); y1 = polys_arr[:, :, 1].max(1)
    suppressed = np.zeros(polys_arr.shape[0], dtype=bool)
    keep = []
    for i in range(n):
        idx = order[i]
        if suppressed[idx]:
            continue
        keep.append(idx)
        for j in range(i + 1, n):
            jdx = order[j]
            if suppressed[jdx]:
                continue
            if (x1[idx] < x0[jdx] or x1[jdx] < x0[idx]
                    or y1[idx] < y0[jdx] or y1[jdx] < y0[idx]):
                continue
            if should_merge(polys_arr[idx], polys_arr[jdx], iou_threshold):
                suppressed[jdx] = True
    keep = np.asarray(keep, dtype=np.int64)
    return polys_arr[keep], scores_arr[keep]


def locality_aware_nms_numpy(boxes: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Pure-numpy LANMS. ``boxes``: (n, 9) rows [x0..y3, score] → (m, 9)."""
    if boxes is None or len(boxes) == 0:
        return _EMPTY.copy()

    boxes = np.asarray(boxes)
    boxes_sorted = np.ascontiguousarray(boxes, dtype=np.float64)[
        np.argsort(boxes[:, 0])
    ]

    merged_polys = []
    merged_scores = []
    weight_sums = []

    for row in boxes_sorted:
        poly = row[:8].reshape(4, 2)
        score = float(row[8])
        if merged_polys:
            last = merged_polys[-1]
            if should_merge(poly, last, iou_threshold):
                aligned = normalize_polygon(last, poly)
                total_w = weight_sums[-1] + score
                merged_polys[-1] = (last * weight_sums[-1] + aligned * score) / total_w
                weight_sums[-1] = total_w
                merged_scores[-1] = max(merged_scores[-1], score)
                continue
        merged_polys.append(poly.copy())
        merged_scores.append(score)
        weight_sums.append(score)

    polys_arr = np.stack(merged_polys)
    scores_arr = np.asarray(merged_scores, dtype=np.float64)

    kept_polys, kept_scores = standard_nms(polys_arr, scores_arr, iou_threshold)
    if kept_polys.size == 0:
        return _EMPTY.copy()
    out = np.concatenate(
        [kept_polys.reshape(kept_polys.shape[0], -1), kept_scores[:, None]], axis=1
    )
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# C++ fast path (ctypes binding to native/lanms.cpp)
# ---------------------------------------------------------------------------

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _find_native_lib() -> Optional[str]:
    here = Path(__file__).resolve().parent
    candidates = [
        here / "_liblanms.so",
        here.parent / "_liblanms.so",
        here.parent.parent / "native" / "liblanms.so",
    ]
    env = os.environ.get("MANUSCRIPT_TPU_LANMS_LIB")
    if env:
        candidates.insert(0, Path(env))
    for c in candidates:
        if c.exists():
            return str(c)
    return None


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_native_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.lanms.restype = ctypes.c_int64
        lib.lanms.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # boxes (n*9), x0-sorted NOT required
            ctypes.c_int64,  # n
            ctypes.c_double,  # iou_threshold
            ctypes.POINTER(ctypes.c_double),  # out (n*9)
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_native() is not None


def locality_aware_nms_native(boxes: np.ndarray, iou_threshold: float) -> np.ndarray:
    lib = _load_native()
    assert lib is not None, "native LANMS library not built"
    if boxes is None or len(boxes) == 0:
        return _EMPTY.copy()
    arr = np.ascontiguousarray(np.asarray(boxes), dtype=np.float64)
    n = arr.shape[0]
    out = np.empty((n, 9), dtype=np.float64)
    m = lib.lanms(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        ctypes.c_double(iou_threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if m == 0:
        return _EMPTY.copy()
    return out[:m].astype(np.float32)


def locality_aware_nms(boxes: np.ndarray, iou_threshold: float) -> np.ndarray:
    """LANMS over (n, 9) quad+score rows; C++ when available, numpy otherwise."""
    if native_available():
        return locality_aware_nms_native(boxes, iou_threshold)
    return locality_aware_nms_numpy(boxes, iou_threshold)
