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
