"""Visualization of detection results.

API parity with the reference's draw_quads / visualize_page (reference:
src/manuscript/detectors/_east/utils.py:42-220): darkened background outside
detections with a soft blurred mask, polygon outlines, optional reading-order
numbering with connecting lines. Returns PIL images.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def draw_quads(
    image: np.ndarray,
    quads,
    color: tuple = (0, 0, 0),
    thickness: int = 1,
    dark_alpha: float = 0.5,
    blur_ksize: int = 11,
) -> Image.Image:
    """Draw quad outlines with a softly darkened background."""
    img = np.asarray(image).copy()
    if quads is None or len(quads) == 0:
        return Image.fromarray(img)
    quads = np.asarray(quads)

    h, w = img.shape[:2]
    dark_bg = (img.astype(np.float32) * (1 - dark_alpha)).astype(np.uint8)

    mask = np.zeros((h, w), dtype=np.float32)
    if cv2 is not None:
        for q in quads:
            pts = np.asarray(q).reshape(-1)[:8].reshape(4, 2).astype(np.int32)
            cv2.fillPoly(mask, [pts], 1.0)
        k = blur_ksize if blur_ksize % 2 == 1 else blur_ksize + 1
        mask = cv2.GaussianBlur(mask, (k, k), 0)
    else:  # pragma: no cover - PIL fallback
        mimg = Image.new("L", (w, h), 0)
        md = ImageDraw.Draw(mimg)
        for q in quads:
            pts = [tuple(p) for p in np.asarray(q).reshape(-1)[:8].reshape(4, 2)]
            md.polygon(pts, fill=255)
        mask = np.asarray(mimg, dtype=np.float32) / 255.0

    mask = np.clip(mask, 0.0, 1.0)[:, :, None]
    out = img.astype(np.float32) * mask + dark_bg.astype(np.float32) * (1 - mask)
    out = np.clip(out, 0, 255).astype(np.uint8)

    pil = Image.fromarray(out)
    draw = ImageDraw.Draw(pil)
    for q in quads:
        pts = [tuple(map(float, p)) for p in np.asarray(q).reshape(-1)[:8].reshape(4, 2)]
        draw.line(pts + [pts[0]], fill=tuple(color), width=max(1, int(thickness)))
    return pil


def _colormap(channel: np.ndarray) -> np.ndarray:
    """Min-max normalize a 2-D map and render with a JET-like colormap."""
    lo, hi = float(channel.min()), float(channel.max())
    norm = (channel - lo) / (hi - lo) if hi > lo else np.zeros_like(channel)
    if cv2 is not None:
        return cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)[
            :, :, ::-1
        ]
    g = (norm * 255).astype(np.uint8)  # pragma: no cover - grayscale fallback
    return np.stack([g, g, g], axis=-1)


def create_collage(
    image_u8: np.ndarray,
    gt_score: np.ndarray,
    gt_geo: np.ndarray,
    gt_quads=None,
    pred_score: np.ndarray = None,
    pred_geo: np.ndarray = None,
    cell_size: int = 320,
) -> np.ndarray:
    """2×10 training-diagnostics grid: [image+boxes, score, 8 geo channels],
    GT row over prediction row (reference:
    src/manuscript/detectors/_east/utils.py:257-325). geo maps are HWC(8)."""
    n_rows, n_cols = 2, 10
    collage = np.full((cell_size * n_rows, cell_size * n_cols, 3), 255, np.uint8)

    def row_cells(score, geo, quads):
        img = image_u8
        if quads is not None and len(quads):
            flat = [np.asarray(q).reshape(-1)[:8] for q in quads]
            img = np.array(draw_quads(image_u8, np.stack(flat), color=(0, 255, 0)))
        cells = [img, _colormap(np.asarray(score))]
        geo = np.asarray(geo)
        for i in range(geo.shape[-1]):
            cells.append(_colormap(geo[..., i]))
        return cells

    rows = [row_cells(gt_score, gt_geo, gt_quads)]
    if pred_score is not None and pred_geo is not None:
        rows.append(row_cells(pred_score, pred_geo, None))
    else:
        rows.append([np.zeros((8, 8, 3), np.uint8)] * n_cols)

    for r, cells in enumerate(rows):
        for c in range(n_cols):
            cell = cells[c]
            if cv2 is not None:
                cell = cv2.resize(cell, (cell_size, cell_size))
            else:  # pragma: no cover
                cell = np.array(
                    Image.fromarray(cell).resize((cell_size, cell_size))
                )
            collage[
                r * cell_size : (r + 1) * cell_size,
                c * cell_size : (c + 1) * cell_size,
            ] = cell
    return collage


def visualize_page(
    image,
    page,
    *,
    show_order: bool = False,
    color: tuple = (0, 0, 255),
    thickness: int = 2,
    dark_alpha: float = 0.3,
    blur_ksize: int = 11,
    line_color: tuple = (0, 255, 0),
    number_color: tuple = (255, 255, 255),
    number_bg: tuple = (0, 0, 0),
) -> Image.Image:
    """Render a Page's words on the image; optionally number them in order."""
    if isinstance(image, Image.Image):
        img = np.array(image.convert("RGB"))
    else:
        img = np.asarray(image).copy()

    quads = []
    words_in_order = []
    for block in page.blocks:
        for w in block.words:
            quads.append(np.asarray(w.polygon, dtype=np.float32).reshape(-1))
            words_in_order.append(w)

    if len(quads) == 0:
        return Image.fromarray(img) if not isinstance(image, Image.Image) else image

    out = draw_quads(
        img,
        np.stack(quads),
        color=color,
        thickness=thickness,
        dark_alpha=dark_alpha,
        blur_ksize=blur_ksize,
    )

    if show_order:
        draw = ImageDraw.Draw(out)
        centers = []
        for w in words_in_order:
            xs = [p[0] for p in w.polygon]
            ys = [p[1] for p in w.polygon]
            centers.append((sum(xs) / len(xs), sum(ys) / len(ys)))
        if len(centers) > 1:
            for p, c in zip(centers, centers[1:]):
                draw.line([p, c], fill=tuple(line_color), width=3)
        for idx, (cx, cy) in enumerate(centers, start=1):
            draw.rectangle([cx - 12, cy - 12, cx + 12, cy + 12], fill=tuple(number_bg))
            draw.text((cx - 6, cy - 8), str(idx), fill=tuple(number_color))

    return out
