"""EAST training data: COCO-JSON → (image, score map, geo map) batches.

Label semantics per the reference (reference:
src/manuscript/detectors/_east/dataset.py:16-199): each segmentation
polygon becomes its min-area rectangle, vertices ordered clockwise from
top-left; the 0.3-shrunk quad is rasterized into a quarter-resolution score
map; geometry channels 2i/2i+1 hold the shrunk vertex offsets
(vx−col, vy−row) in map-scale pixels. Images without a single valid (≥4-pt)
annotation are dropped with a warning.

Host-side numpy/cv2 throughout (train-time label synthesis is not on the
device hot path); batches are delivered as uint8 NHWC + float32 maps ready
for a single host→device transfer. A threaded prefetching loader replaces
torch's DataLoader workers.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import warnings
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..ops.boxes import expand_boxes


def order_vertices_clockwise(poly: np.ndarray) -> np.ndarray:
    """Order 4 points TL, TR, BR, BL by coordinate sums/differences."""
    poly = np.asarray(poly, dtype=np.float32).reshape(-1, 2)
    s = poly.sum(axis=1)
    d = np.diff(poly, axis=1).ravel()
    return np.array(
        [poly[np.argmin(s)], poly[np.argmin(d)], poly[np.argmax(s)], poly[np.argmax(d)]],
        dtype=np.float32,
    )


def shrink_quad(quad: np.ndarray, ratio: float = 0.3) -> np.ndarray:
    """Move each vertex inward by ratio·min(adjacent edge lengths) along the
    averaged inward normal — the inverse of ops.boxes.expand_boxes."""
    row = np.concatenate([np.asarray(quad, np.float32).reshape(8), [1.0]])[None]
    shrunk = expand_boxes(row, expand_w=-ratio, expand_h=-ratio)
    return shrunk[0, :8].reshape(4, 2)


def min_area_quad(points: np.ndarray) -> np.ndarray:
    """Min-area rectangle of a point set, clockwise-ordered."""
    if cv2 is not None:
        rect = cv2.minAreaRect(points.astype(np.float32))
        box = cv2.boxPoints(rect)
    else:  # pragma: no cover - cv2 expected
        x0, y0 = points.min(axis=0)
        x1, y1 = points.max(axis=0)
        box = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)
    return order_vertices_clockwise(box)


def rasterize_quad_maps(
    quads: Sequence[np.ndarray],
    target_size: int,
    score_geo_scale: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (score_map (h,w), geo_map (h,w,8)) from input-scale quads."""
    out_h = int(target_size * score_geo_scale)
    out_w = int(target_size * score_geo_scale)
    score = np.zeros((out_h, out_w), dtype=np.float32)
    geo = np.zeros((out_h, out_w, 8), dtype=np.float32)

    for quad in quads:
        shrunk = shrink_quad(order_vertices_clockwise(quad), 0.3)
        coords = shrunk * score_geo_scale  # map-scale vertices
        mask = np.zeros((out_h, out_w), dtype=np.uint8)
        cv2.fillPoly(mask, [np.round(coords).astype(np.int32)], 1)
        rr, cc = np.nonzero(mask)
        if len(rr) == 0:
            continue
        score[rr, cc] = 1.0
        for i, (vx, vy) in enumerate(coords):
            geo[rr, cc, 2 * i] = vx - cc
            geo[rr, cc, 2 * i + 1] = vy - rr
    return score, geo


def color_jitter(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.5,
    contrast: float = 0.5,
    saturation: float = 0.5,
    hue: float = 0.25,
) -> np.ndarray:
    """Torch-style ColorJitter equivalent on uint8 RGB (host)."""
    out = img.astype(np.float32)
    if brightness > 0:
        out = out * rng.uniform(1 - brightness, 1 + brightness)
    if contrast > 0:
        mean = out.mean()
        out = (out - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    if saturation > 0:
        gray = out.mean(axis=2, keepdims=True)
        f = rng.uniform(1 - saturation, 1 + saturation)
        out = gray + (out - gray) * f
    if hue > 0 and cv2 is not None:
        hsv = cv2.cvtColor(
            np.clip(out, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
        ).astype(np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(rng.uniform(-hue, hue) * 180)) % 180
        out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


class EASTDataset:
    """COCO-annotated page dataset producing detector training targets."""

    def __init__(
        self,
        images_folder: Union[str, Path],
        coco_annotation_file: Union[str, Path],
        target_size: int = 512,
        score_geo_scale: float = 0.25,
        augment: bool = True,
        dataset_name: Optional[str] = None,
        seed: int = 0,
        cache_maps_mb: float = 2048.0,
    ):
        self.images_folder = str(images_folder)
        self.target_size = target_size
        self.score_geo_scale = score_geo_scale
        self.augment = augment
        self.dataset_name = dataset_name or Path(images_folder).stem
        self.rng = np.random.default_rng(seed)

        with open(coco_annotation_file, "r", encoding="utf-8") as f:
            data = json.load(f)
        self.images_info = {img["id"]: img for img in data["images"]}
        self.image_ids = list(self.images_info.keys())
        self.annots: Dict = {}
        for ann in data["annotations"]:
            self.annots.setdefault(ann["image_id"], []).append(ann)
        self._drop_invalid()
        self._map_cache: Dict[int, tuple] = {}
        self._map_cache_budget = int(cache_maps_mb * 1e6)
        self._map_cache_bytes = 0

    def _drop_invalid(self) -> None:
        bad = []
        for img_id in list(self.image_ids):
            ok = False
            for ann in self.annots.get(img_id, []):
                seg = ann.get("segmentation")
                if seg:
                    flat = seg[0] if isinstance(seg[0], list) else seg
                    if np.asarray(flat, dtype=np.float32).reshape(-1, 2).shape[0] >= 4:
                        ok = True
                        break
            if not ok:
                bad.append(img_id)
        for img_id in bad:
            self.image_ids.remove(img_id)
            self.annots.pop(img_id, None)
        if bad:
            warnings.warn(
                f"EASTDataset: dropped {len(bad)} images without valid quads",
                UserWarning,
            )

    def __len__(self) -> int:
        return len(self.image_ids)

    def quads_for(self, idx: int) -> List[np.ndarray]:
        """Input-scale GT quads for sample idx (for viz / F1 eval)."""
        image_id = self.image_ids[idx]
        info = self.images_info[image_id]
        sx = self.target_size / info["width"]
        sy = self.target_size / info["height"]
        quads = []
        for ann in self.annots.get(image_id, []):
            seg = ann.get("segmentation")
            if not seg:
                continue
            parts = seg if isinstance(seg[0], list) else [seg]
            for part in parts:
                pts = np.asarray(part, dtype=np.float32).reshape(-1, 2)
                if pts.size == 0:
                    continue
                quad = min_area_quad(pts)
                quad[:, 0] *= sx
                quad[:, 1] *= sy
                quads.append(quad)
        return quads

    def __getitem__(self, idx: int):
        image_id = self.image_ids[idx]
        info = self.images_info[image_id]
        path = os.path.join(self.images_folder, info["file_name"])
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(f"Image not found: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.target_size, self.target_size))
        if self.augment:
            img = color_jitter(img, self.rng)

        # the label maps depend only on idx (quads and target size are
        # fixed; augmentation is photometric) — rasterizing them per epoch
        # made small-dataset training host-bound on one core, so they are
        # cached after the first epoch (~0.6 MB per 512² sample) UP TO
        # cache_maps_mb total; past the budget samples rasterize per epoch
        # so large corpora never accumulate unbounded host RAM
        cached = self._map_cache.get(idx)
        if cached is None:
            quads = self.quads_for(idx)
            score, geo = rasterize_quad_maps(
                quads, self.target_size, self.score_geo_scale
            )
            cached = (score, geo, quads)
            sz = score.nbytes + geo.nbytes
            if self._map_cache_bytes + sz <= self._map_cache_budget:
                self._map_cache[idx] = cached
                self._map_cache_bytes += sz
        score, geo, quads = cached
        return img, score, geo, quads


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        ds_idx = int(np.searchsorted(self._offsets[1:], idx, side="right"))
        return self.datasets[ds_idx][idx - self._offsets[ds_idx]]


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = False,
    num_threads: int = 4,
    include_quads: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Threaded prefetching batch loader (replaces torch DataLoader workers).

    Yields {"image" (B,H,W,3) u8, "score" (B,h,w) f32, "geo" (B,h,w,8) f32}.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    chunks = [
        order[i : i + batch_size] for i in range(0, len(order), batch_size)
    ]
    if drop_last:
        chunks = [c for c in chunks if len(c) == batch_size]

    q: "queue.Queue" = queue.Queue(maxsize=max(2, num_threads))
    sentinel = object()

    def worker():
        for chunk in chunks:
            items = [dataset[int(i)] for i in chunk]
            batch = {
                "image": np.stack([it[0] for it in items]),
                "score": np.stack([it[1] for it in items]),
                "geo": np.stack([it[2] for it in items]),
            }
            if include_quads:
                batch["quads"] = [it[3] for it in items]
            q.put(batch)
        q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
