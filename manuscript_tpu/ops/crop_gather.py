"""Batched device crop-gather: detector boxes → recognizer-ready crops in HBM.

This is the detector→recognizer handoff the host pipeline pays the link for
(reference semantics: src/manuscript/_pipeline.py:204-221 — clamped
axis-aligned crop — followed by the recognizer's aspect-preserving white-pad
resize, src/manuscript/recognizers/_trba/data/transforms.py:62-120). Here
both happen as one fixed-shape gather program over the detector input image
that is ALREADY device-resident, so a fused detect→recognize pipeline never
round-trips crops through the host.

Sampling is bilinear with the cv2 pixel-center convention
(src = (dst + 0.5) · src_size/dst_size − 0.5, edge-clamped); the host path
uses INTER_AREA only when shrinking, but fused-path crops come from the
detector-resolution image and are upscaled in the common case, where cv2
also uses INTER_LINEAR.
"""

from __future__ import annotations

import jax.numpy as jnp


def crop_resize_pad(
    img_u8: jnp.ndarray,  # (H, W, 3) uint8, device-resident
    boxes: jnp.ndarray,  # (N, 4) float [x1, y1, x2, y2] in img coords
    valid: jnp.ndarray,  # (N,) bool
    out_h: int = 64,
    out_w: int = 256,
) -> jnp.ndarray:
    """Gather N axis-aligned crops and resize-pad each onto a white
    (out_h, out_w) canvas: aspect-preserving, left-aligned horizontally,
    centered vertically — bit-matching ops/image.resize_and_pad up to the
    interpolator. Invalid rows come back as all-white. Returns uint8
    (N, out_h, out_w, 3)."""
    h, w = img_u8.shape[:2]
    f32 = jnp.float32

    x1 = jnp.clip(jnp.floor(boxes[:, 0]), 0, w - 1).astype(f32)
    y1 = jnp.clip(jnp.floor(boxes[:, 1]), 0, h - 1).astype(f32)
    x2 = jnp.clip(jnp.floor(boxes[:, 2]), 0, w).astype(f32)
    y2 = jnp.clip(jnp.floor(boxes[:, 3]), 0, h).astype(f32)
    cw = jnp.maximum(x2 - x1, 1.0)
    ch = jnp.maximum(y2 - y1, 1.0)

    # resize_and_pad geometry: scale to fit, round target, left/center pad
    scale = jnp.minimum(out_h / ch, out_w / cw)
    new_w = jnp.maximum(jnp.round(cw * scale), 1.0)
    new_h = jnp.maximum(jnp.round(ch * scale), 1.0)
    sx = cw / new_w  # exact per-axis src/dst ratio, like cv2.resize
    sy = ch / new_h
    y_off = jnp.floor((out_h - new_h) / 2.0)

    jj = jnp.arange(out_w, dtype=f32)[None, None, :]  # (1, 1, out_w)
    ii = jnp.arange(out_h, dtype=f32)[None, :, None]  # (1, out_h, 1)
    b = lambda v: v[:, None, None]  # noqa: E731 — broadcast (N,) over (h, w)

    src_x = b(x1) + (jj + 0.5) * b(sx) - 0.5
    src_y = b(y1) + (ii - b(y_off) + 0.5) * b(sy) - 0.5
    inside = (jj < b(new_w)) & (ii >= b(y_off)) & (ii < b(y_off) + b(new_h))
    inside &= valid[:, None, None]

    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    fx = jnp.clip(src_x - x0, 0.0, 1.0)
    fy = jnp.clip(src_y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = img_u8.reshape(h * w, 3)

    def gat(yi, xi):
        return flat[(yi * w + xi).reshape(-1)].astype(f32)

    n = boxes.shape[0]
    shape = (n, out_h, out_w, 3)
    v00 = gat(y0i, x0i).reshape(shape)
    v01 = gat(y0i, x1i).reshape(shape)
    v10 = gat(y1i, x0i).reshape(shape)
    v11 = gat(y1i, x1i).reshape(shape)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy

    out = jnp.where(inside[..., None], out, 255.0)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
