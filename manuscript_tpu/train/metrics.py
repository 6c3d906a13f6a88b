"""Quality metrics: CER / WER / exact accuracy and detection F1@IoU.

Semantics per the reference (reference:
src/manuscript/recognizers/_trba/training/metrics.py:6-33 and
src/manuscript/detectors/_east/utils.py:425-474): CER = edit distance /
len(ref) with inf for empty-ref/nonempty-hyp; WER = word-level edit distance
(jiwer equivalent, implemented directly — no jiwer dependency); detection F1
by greedy IoU matching of predictions to unused GT polygons. Polygon IoU
uses our own convex clipping kernels instead of shapely.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

try:
    import Levenshtein

    def _edit_distance(a: str, b: str) -> int:
        return Levenshtein.distance(a, b)

except Exception:  # pragma: no cover

    def _edit_distance(a: str, b: str) -> int:
        return _levenshtein_generic(list(a), list(b))


def _levenshtein_generic(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i]
        for j, cb in enumerate(b, 1):
            curr.append(min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = curr
    return prev[-1]


def character_error_rate(ref: str, hyp: str) -> float:
    if len(ref) == 0:
        return 0.0 if len(hyp) == 0 else float("inf")
    return _edit_distance(ref, hyp) / len(ref)


def word_error_rate(ref: str, hyp: str) -> float:
    ref_words = ref.split()
    hyp_words = hyp.split()
    if len(ref_words) == 0:
        return 0.0 if len(hyp_words) == 0 else float("inf")
    return _levenshtein_generic(ref_words, hyp_words) / len(ref_words)


def compute_accuracy(refs: Sequence[str], hyps: Sequence[str]) -> float:
    if not refs:
        return 0.0
    return float(np.mean([r == h for r, h in zip(refs, hyps)]))


def aggregate_text_metrics(refs: Sequence[str], hyps: Sequence[str]) -> Dict[str, float]:
    cers = [character_error_rate(r, h) for r, h in zip(refs, hyps)]
    wers = [word_error_rate(r, h) for r, h in zip(refs, hyps)]
    finite = lambda xs: [x for x in xs if np.isfinite(x)]
    return {
        "accuracy": compute_accuracy(refs, hyps),
        "cer": float(np.mean(finite(cers))) if finite(cers) else 0.0,
        "wer": float(np.mean(finite(wers))) if finite(wers) else 0.0,
    }


# ---------------------------------------------------------------------------
# Detection F1
# ---------------------------------------------------------------------------


def poly_iou(seg_a, seg_b) -> float:
    """IoU of two polygons given as flat coordinate lists or (N,2) arrays."""
    from ..ops.geometry import polygon_iou

    a = np.asarray(seg_a, dtype=np.float64).reshape(-1, 2)
    b = np.asarray(seg_b, dtype=np.float64).reshape(-1, 2)
    if a.shape[0] < 3 or b.shape[0] < 3:
        return 0.0
    return polygon_iou(a, b)


def compute_f1(
    preds: List[Dict],
    thresh: float,
    gt_segs: Dict,
    processed_ids: Sequence,
) -> float:
    """Greedy-matched detection F1 at one IoU threshold.

    preds: [{"image_id", "segmentation": flat coords}], gt_segs:
    {image_id: [flat coords, …]}.
    """
    used = {iid: [False] * len(gt_segs.get(iid, [])) for iid in processed_ids}
    tp = fp = 0
    for p in preds:
        iid = p["image_id"]
        best_iou, best_j = 0.0, -1
        for j, gt in enumerate(gt_segs.get(iid, [])):
            if used[iid][j]:
                continue
            iou = poly_iou(p["segmentation"], gt)
            if iou > best_iou:
                best_iou, best_j = iou, j
        if best_iou >= thresh:
            tp += 1
            used[iid][best_j] = True
        else:
            fp += 1
    total_gt = sum(len(v) for v in gt_segs.values())
    fn = total_gt - tp
    prec = tp / (tp + fp) if tp + fp > 0 else 0.0
    rec = tp / (tp + fn) if tp + fn > 0 else 0.0
    return 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0


def compute_f1_metrics(
    preds: List[Dict],
    gt_segs: Dict,
    processed_ids: Sequence,
    avg_range=(0.50, 0.95),
    avg_step: float = 0.05,
) -> Dict[str, float]:
    """F1@0.5 and mean F1 over the IoU range (COCO-style 0.5:0.95)."""
    f1_05 = compute_f1(preds, 0.5, gt_segs, processed_ids)
    ious = np.arange(avg_range[0], avg_range[1] + 1e-9, avg_step)
    f1s = [compute_f1(preds, float(t), gt_segs, processed_ids) for t in ious]
    return {"f1@0.5": f1_05, "f1@0.5:0.95": float(np.mean(f1s))}
