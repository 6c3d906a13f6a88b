"""TRBA training data: CSV/TSV label files + image folders.

Capability parity with the reference dataset stack (reference:
src/manuscript/recognizers/_trba/data/dataset.py:1-349): delimiter inferred
from extension, header auto-detection, multithreaded row validation with a
categorized skip report (missing files / charset violations / overlength),
basename-index fallback for path resolution, lazy unreadable-image skipping
with bounded random retry, proportional multi-dataset batch sampling, and an
attention-target collate.

Host-side; batches come out as uint8 NHWC + int32 targets for one transfer.
Augmentation (shift-scale-rotate on a white canvas, brightness/contrast,
invert) is implemented in numpy/cv2 — albumentations isn't a dependency.
"""

from __future__ import annotations

import csv
import os
from collections import Counter, defaultdict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..ops.image import resize_and_pad, to_rgb_u8
from ..recognizers.charset import pack_targets

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def build_file_index(roots: Union[str, Sequence[str]]) -> Dict[str, List[str]]:
    """Recursive basename → paths index for fast fallback lookup."""
    if isinstance(roots, str):
        roots = [roots]
    index: Dict[str, List[str]] = defaultdict(list)
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, _, filenames in os.walk(root):
            for fn in filenames:
                if os.path.splitext(fn)[1].lower() in IMG_EXTS:
                    index[fn.lower()].append(os.path.join(dirpath, fn))
    return index


def imread_unicode(path: str) -> np.ndarray:
    """cv2 imread tolerant of non-ASCII paths (decode from bytes)."""
    data = np.fromfile(path, dtype=np.uint8)
    img = cv2.imdecode(data, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"Failed to read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def read_label_file(path: str) -> List[Tuple[str, str]]:
    """CSV (,) or TSV (\\t) of (filename, text); header auto-detected."""
    delimiter = "\t" if str(path).lower().endswith((".tsv", ".txt")) else ","
    rows: List[Tuple[str, str]] = []
    with open(path, "r", encoding="utf-8", newline="") as f:
        reader = csv.reader(f, delimiter=delimiter)
        for i, row in enumerate(reader):
            if len(row) < 2:
                continue
            name, text = row[0], row[1]
            if i == 0 and name.strip().lower() in {
                "filename", "file", "image", "path", "img", "image_path",
            }:
                continue
            rows.append((name, text))
    return rows


class AugmentParams:
    """Train-time augmentation knobs (Optuna-tunable in the reference's
    config, transforms.py:160-182)."""

    def __init__(
        self,
        shift_limit: float = 0.03,
        scale_limit: float = 0.08,
        rotate_limit: float = 3.0,
        p_shift_scale_rotate: float = 0.3,
        brightness_limit: float = 0.2,
        contrast_limit: float = 0.2,
        p_brightness_contrast: float = 0.3,
        invert_p: float = 0.0,
        p_downscale: float = 0.0,
        downscale_min: float = 0.4,
        downscale_max: float = 0.75,
    ):
        self.shift_limit = shift_limit
        self.scale_limit = scale_limit
        self.rotate_limit = rotate_limit
        self.p_shift_scale_rotate = p_shift_scale_rotate
        self.brightness_limit = brightness_limit
        self.contrast_limit = contrast_limit
        self.p_brightness_contrast = p_brightness_contrast
        self.invert_p = invert_p
        # resolution degradation (albumentations-Downscale analog, off by
        # default for reference parity): down- then re-upsample so the
        # recognizer learns the fused pipeline's deployment distribution —
        # word crops sampled from the DETECTOR-resolution page are ~2×
        # blurrier than full-res training crops (BASELINE.md crop PSNR rows)
        self.p_downscale = p_downscale
        self.downscale_min = downscale_min
        self.downscale_max = downscale_max

    @classmethod
    def from_config(cls, cfg: Dict) -> "AugmentParams":
        return cls(
            shift_limit=cfg.get("shift_limit", 0.03),
            scale_limit=cfg.get("scale_limit", 0.08),
            rotate_limit=cfg.get("rotate_limit", 3),
            p_shift_scale_rotate=cfg.get("p_ShiftScaleRotate", 0.3),
            brightness_limit=cfg.get("brightness_limit", 0.2),
            contrast_limit=cfg.get("contrast_limit", 0.2),
            p_brightness_contrast=cfg.get("p_BrightnessContrast", 0.3),
            invert_p=cfg.get("invert_p", 0.0),
            p_downscale=cfg.get("p_Downscale", 0.0),
            downscale_min=cfg.get("downscale_min", 0.4),
            downscale_max=cfg.get("downscale_max", 0.75),
        )


def augment_word_image(
    img: np.ndarray, rng: np.random.Generator, p: AugmentParams
) -> np.ndarray:
    """Shift-scale-rotate on a white border + brightness/contrast + invert."""
    out = img
    if rng.uniform() < p.p_shift_scale_rotate and cv2 is not None:
        h, w = out.shape[:2]
        angle = rng.uniform(-p.rotate_limit, p.rotate_limit)
        scale = 1.0 + rng.uniform(-p.scale_limit, p.scale_limit)
        tx = rng.uniform(-p.shift_limit, p.shift_limit) * w
        ty = rng.uniform(-p.shift_limit, p.shift_limit) * h
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        m[:, 2] += (tx, ty)
        out = cv2.warpAffine(
            out, m, (w, h), borderMode=cv2.BORDER_CONSTANT,
            borderValue=(255, 255, 255),
        )
    if rng.uniform() < p.p_brightness_contrast:
        f = out.astype(np.float32)
        f = f * (1.0 + rng.uniform(-p.contrast_limit, p.contrast_limit))
        f = f + rng.uniform(-p.brightness_limit, p.brightness_limit) * 255.0
        out = np.clip(f, 0, 255).astype(np.uint8)
    if rng.uniform() < p.invert_p:
        out = 255 - out
    if rng.uniform() < p.p_downscale and cv2 is not None:
        h, w = out.shape[:2]
        f = rng.uniform(p.downscale_min, p.downscale_max)
        small = cv2.resize(
            out, (max(1, int(w * f)), max(1, int(h * f))),
            interpolation=cv2.INTER_LINEAR,
        )
        out = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    return out


class OCRDataset:
    """Validated (image, text) dataset for attention training."""

    def __init__(
        self,
        label_file: str,
        image_root: Union[str, Sequence[str]],
        stoi: Dict[str, int],
        max_len: int = 25,
        img_h: int = 64,
        img_w: int = 256,
        augment: bool = False,
        augment_params: Optional[AugmentParams] = None,
        charset_strict: bool = True,
        num_validation_threads: int = 8,
        seed: int = 0,
        name: Optional[str] = None,
    ):
        self.stoi = stoi
        self.max_len = max_len
        self.img_h = img_h
        self.img_w = img_w
        self.augment = augment
        self.augment_params = augment_params or AugmentParams()
        self.rng = np.random.default_rng(seed)
        self.name = name or Path(label_file).stem

        roots = [image_root] if isinstance(image_root, str) else list(image_root)
        rows = read_label_file(label_file)
        index = build_file_index(roots)
        specials = {v for k, v in stoi.items() if k.startswith("<")}

        skip_reasons: Counter = Counter()
        missing_chars: Counter = Counter()
        samples: List[Tuple[str, str]] = []

        def validate(row):
            name_, text = row
            # path resolution: direct join per root, then basename index
            path = None
            for root in roots:
                cand = os.path.join(root, name_)
                if os.path.exists(cand):
                    path = cand
                    break
            if path is None:
                hits = index.get(os.path.basename(name_).lower())
                if hits:
                    path = hits[0]
            if path is None:
                return None, "missing_file", text
            if len(text) > max_len:
                return None, "too_long", text
            if charset_strict:
                for ch in text:
                    if ch not in stoi or stoi[ch] in specials:
                        return None, "charset", ch
            return (path, text), None, None

        with ThreadPoolExecutor(max_workers=num_validation_threads) as ex:
            for result, reason, payload in ex.map(validate, rows):
                if result is not None:
                    samples.append(result)
                else:
                    skip_reasons[reason] += 1
                    if reason == "charset":
                        missing_chars[payload] += 1

        self.samples = samples
        self.skip_report = dict(skip_reasons)
        self.missing_chars_top = missing_chars.most_common(30)
        if skip_reasons:
            print(
                f"[OCRDataset:{self.name}] kept {len(samples)}/{len(rows)} rows; "
                f"skipped: {dict(skip_reasons)}"
                + (
                    f"; top missing chars: {self.missing_chars_top[:10]}"
                    if missing_chars
                    else ""
                )
            )

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int, _retries: int = 8):
        path, text = self.samples[idx]
        try:
            img = imread_unicode(path)
        except Exception:
            # lazy skip of unreadable images: bounded random substitute
            if _retries <= 0:
                raise
            alt = int(self.rng.integers(0, len(self.samples)))
            return self.__getitem__(alt, _retries - 1)
        img = to_rgb_u8(img)
        if self.augment:
            img = augment_word_image(img, self.rng, self.augment_params)
        img = resize_and_pad(img, self.img_h, self.img_w)
        return img, text


class MultiDataset:
    """Index union of several datasets by (dataset_idx, sample_idx)."""

    def __init__(self, datasets: Sequence[OCRDataset]):
        self.datasets = list(datasets)
        self.flat = [
            (d, i) for d, ds in enumerate(self.datasets) for i in range(len(ds))
        ]

    def __len__(self):
        return len(self.flat)

    def __getitem__(self, idx):
        d, i = self.flat[idx]
        return self.datasets[d][i]


def proportional_batches(
    datasets: Sequence[OCRDataset],
    proportions: Sequence[float],
    batch_size: int,
    seed: int = 0,
) -> Iterator[List[Tuple[int, int]]]:
    """Yield batches mixing datasets at fixed proportions; each dataset
    reshuffles independently when exhausted. One epoch = until the LARGEST
    proportional stream is consumed once."""
    props = np.asarray(proportions, dtype=np.float64)
    props = props / props.sum()
    counts = np.round(props * batch_size).astype(int)
    counts[0] += batch_size - counts.sum()  # exact batch size

    rngs = [np.random.default_rng(seed + i) for i in range(len(datasets))]
    orders = [rngs[i].permutation(len(d)) for i, d in enumerate(datasets)]
    cursors = [0] * len(datasets)

    main = int(np.argmax(counts))
    n_batches = max(1, len(datasets[main]) // max(counts[main], 1))

    for _ in range(n_batches):
        batch: List[Tuple[int, int]] = []
        for d, c in enumerate(counts):
            for _ in range(c):
                if cursors[d] >= len(orders[d]):
                    orders[d] = rngs[d].permutation(len(datasets[d]))
                    cursors[d] = 0
                batch.append((d, int(orders[d][cursors[d]])))
                cursors[d] += 1
        yield batch


def collate_attention(
    items: Sequence[Tuple[np.ndarray, str]],
    stoi: Dict[str, int],
    max_len: int,
) -> Dict[str, np.ndarray]:
    """Stack images + pack SOS/EOS/PAD targets for the attention decoder."""
    imgs = np.stack([it[0] for it in items])
    texts = [it[1] for it in items]
    text_in, target_y, lengths = pack_targets(texts, stoi, max_len)
    return {
        "image": imgs,
        "text_in": text_in,
        "target_y": target_y,
        "lengths": lengths,
        "texts": texts,
    }
