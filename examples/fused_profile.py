"""Per-stage device times for the fused page program, on the live backend.

VERDICT r3 weak #3/#5: before attacking MFU, measure where the fused
program's time actually goes ON THE CHIP. This builds the same stage
pipeline as ``FusedOCR._build_program`` (fused.py:222-348) as a family of
CUMULATIVE jitted programs — EAST forward; +decode/compact; +LANMS;
+postprocess/select/crop; +TRBA encode; +TRBA decode (greedy and beam) —
and times each with the differential-chain method (the tunnel's
``block_until_ready`` is unreliable; see BASELINE.md r2 methodology):
iteration i+1's input data-depends on iteration i's scalar output, so the
per-iteration differential cancels dispatch + d2h overheads. Stage time =
cumulative(depth) − cumulative(depth−1).

Run plain for the TPU measurement (one JSON line per stage); smoke mode
(MANUSCRIPT_TPU_BENCH_SMOKE=1) runs tiny shapes on CPU to validate the
harness itself.
"""

import json
import os
import statistics
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")


def chain_time(run, n_lo: int, n_hi: int, repeats: int = 5) -> float:
    """Median per-iteration seconds via the differential chain method
    (same scheme as examples/pallas_bench.py)."""
    float(run(n_lo))  # compile both chain lengths
    float(run(n_hi))
    per_iter = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(n_hi))
        t_hi = time.perf_counter() - t0
        per_iter.append((t_hi - t_lo) / (n_hi - n_lo))
    return statistics.median(per_iter)


STAGES = [
    "east_forward",
    "decode_compact",
    "lanms",
    "postprocess_crop",
    "trba_cnn",
    "trba_encode",
    "trba_decode",
]


def make_stage_fn(fused, depth: int, mode: str):
    """Cumulative program through ``STAGES[:depth+1]`` — the same ops, in
    the same order, as fused.py:222-348 (transport decode elided: inputs
    start as a device-resident uint8 page, matching the device-only
    methodology)."""
    import jax.numpy as jnp

    from manuscript_tpu.ops.crop_gather import crop_resize_pad_mm
    from manuscript_tpu.ops.decode import compact_candidates, decode_cells_jax
    from manuscript_tpu.ops.lanms_jax import locality_aware_nms_parallel
    from manuscript_tpu.ops.postprocess_jax import postprocess_boxes_jax

    det, rec = fused.detector, fused.recognizer
    east_model, trba_model = det.model, rec.model
    q = det.quantization
    geo_scale = 1.0 / det.score_geo_scale
    max_cands, max_boxes = det.max_candidates, det.max_boxes
    max_words = fused.max_words
    min_text = float(fused.min_text_size)
    img_h, img_w = rec.img_h, rec.img_w

    def fn(east_vars, trba_vars, u8_img, eps, score_thresh, iou_thresh, sx, sy):
        x = (u8_img.astype(east_model.dtype) / 255.0 - 0.5) / 0.5
        x = x + eps.astype(east_model.dtype)  # chain dependence (value no-op)
        out = east_model.apply(east_vars, x[None])
        score = out["score"][0, :, :, 0]
        geo = out["geometry"][0]
        if depth == 0:
            return score.astype(jnp.float32).sum()
        quads, scores, valid = decode_cells_jax(
            score, geo, score_thresh, quantization=q, scale=geo_scale
        )
        cands = compact_candidates(quads, scores, valid, max_cands)
        if depth == 1:
            return cands.astype(jnp.float32).sum()
        merged, count = locality_aware_nms_parallel(
            cands, iou_thresh, max_out=max_boxes
        )
        if depth == 2:
            return merged.astype(jnp.float32).sum() + count.astype(jnp.float32)
        boxes9, bvalid = postprocess_boxes_jax(
            merged, count, det.expand_ratio_w, det.expand_ratio_h, sx, sy,
            axis_aligned=det.axis_aligned_output,
            remove_anomalies=det.remove_area_anomalies,
            anomaly_sigma=det.anomaly_sigma_threshold,
            anomaly_min_count=det.anomaly_min_box_count,
        )
        bq = boxes9[:, :8].reshape(max_boxes, 4, 2)
        x_min = jnp.floor(bq[..., 0].min(axis=1))
        x_max = jnp.floor(bq[..., 0].max(axis=1))
        y_min = jnp.floor(bq[..., 1].min(axis=1))
        y_max = jnp.floor(bq[..., 1].max(axis=1))
        big = ((x_max - x_min) >= min_text) & ((y_max - y_min) >= min_text)
        sel = bvalid & big
        sel = sel & (jnp.cumsum(sel) <= max_words)
        slot = jnp.where(sel, jnp.cumsum(sel) - 1, max_words)
        n_sel = jnp.sum(sel)

        def scatter(vals):
            buf = jnp.full((max_words + 1,), 0.0, jnp.float32)
            return buf.at[slot].set(vals)[:max_words]

        det_boxes = jnp.stack(
            [scatter(x_min / sx), scatter(y_min / sy),
             scatter(x_max / sx), scatter(y_max / sy)], axis=1
        )
        wvalid = jnp.arange(max_words) < n_sel
        crops = crop_resize_pad_mm(
            u8_img, det_boxes, wvalid, out_h=img_h, out_w=img_w,
            dtype=fused.crop_dtype, aspect=(sx, sy),
        )
        if depth == 3:
            return crops.astype(jnp.float32).sum()
        xc = (crops.astype(trba_model.dtype) / 255.0 - 0.5) / 0.5
        if depth == 4:
            # CNN + height-pool only (the encoder minus the BiLSTM stack)
            feat = trba_model.apply(
                trba_vars, xc, method=lambda m, x: jnp.mean(m.cnn(x), axis=1)
            )
            return feat.astype(jnp.float32).sum()
        enc = trba_model.apply(trba_vars, xc, method="encode")
        if depth == 5:
            return enc.astype(jnp.float32).sum()
        if mode == "greedy":
            logits, preds = trba_model.apply(
                trba_vars, xc, max_len=rec.max_length, method="greedy"
            )
        else:
            logits, preds = trba_model.apply(
                trba_vars, xc, max_len=rec.max_length,
                beam_size=fused.beam_size, alpha=fused.alpha,
                temperature=fused.temperature, method="beam",
            )
        return logits.astype(jnp.float32).sum() + preds.astype(jnp.float32).sum()

    return fn


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    smoke = os.environ.get("MANUSCRIPT_TPU_BENCH_SMOKE") == "1"
    if smoke:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        jax.config.update("jax_disable_most_optimizations", True)

    from bench import build_page  # the bench page → same calibration space

    from manuscript_tpu.detectors import EAST
    from manuscript_tpu.fused import FusedOCR
    from manuscript_tpu.recognizers import TRBA

    target = 128 if smoke else 1280
    max_words = int(os.environ.get("MANUSCRIPT_TPU_PROFILE_WORDS", "64"))
    # default box capacity matches what auto-capacity would size for this
    # page (fused._apply_capacity: max(4*cap, 256)) — the bench config
    max_boxes = int(os.environ.get("MANUSCRIPT_TPU_PROFILE_BOXES", "256"))
    max_cands = int(os.environ.get("MANUSCRIPT_TPU_PROFILE_CANDS", "4096"))
    east = EAST(
        target_size=target,
        max_candidates=256 if smoke else max_cands,
        max_boxes=16 if smoke else max_boxes,
        dtype=jnp.bfloat16,
        **({"backbone": "resnet50-tiny"} if smoke else {}),
    )
    trba = TRBA(
        dtype=jnp.bfloat16, **({"cnn_stage_plan": "tiny"} if smoke else {})
    )
    fused = FusedOCR(east, trba, max_words=8 if smoke else max_words)
    page = build_page(0, h=256, w=192) if smoke else build_page(0)

    from manuscript_tpu.ops.image import detector_preprocess_host

    resized = detector_preprocess_host(page, target)
    thresh, _ = fused.calibrate(page, target_max_words=250)
    u8 = jnp.asarray(resized)
    sx = jnp.float32(page.shape[1] / target)
    sy = jnp.float32(page.shape[0] / target)
    print(json.dumps({
        "backend": jax.default_backend(), "target": target,
        "max_words": fused.max_words, "max_boxes": east.max_boxes,
        "thresh": round(float(thresh), 4),
    }), flush=True)

    def chained(stage_fn):
        # fori_loop with a TRACED bound: one compile per stage covers both
        # chain lengths (the tunnel's compile service is the budget here —
        # a static scan length would double the compile count)
        # weights ride as jit ARGUMENTS: closing over them embeds ~100 MB
        # of constants in the HLO and the tunnel's remote-compile service
        # rejects the request with HTTP 413
        @jax.jit
        def run_jit(ev, tv, u8_img, n):
            def body(_, carry):
                s = stage_fn(
                    ev, tv, u8_img,
                    carry * jnp.float32(1e-30), jnp.float32(thresh),
                    jnp.float32(east.iou_threshold), sx, sy,
                )
                return s * jnp.float32(1e-20)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        return lambda n: run_jit(
            east.variables, trba.variables, u8, jnp.int32(n)
        )

    n_lo, n_hi = (1, 2) if smoke else (2, 8)
    results = {}
    prev = 0.0
    for depth, name in enumerate(STAGES):
        mode = fused.mode if name == "trba_decode" else "greedy"
        run = chained(make_stage_fn(fused, depth, mode))
        t = chain_time(run, n_lo, n_hi, repeats=3 if smoke else 5)
        results[name] = t
        line = {
            "stage": name, "cumulative_ms": round(t * 1e3, 2),
            "stage_ms": round((t - prev) * 1e3, 2),
        }
        if name == "trba_decode":
            line["mode"] = fused.mode
        print(json.dumps(line), flush=True)
        prev = t

    # greedy decode tail as a comparison line (beam is the product default)
    if fused.mode != "greedy":
        run = chained(make_stage_fn(fused, 6, "greedy"))
        t = chain_time(run, n_lo, n_hi, repeats=3 if smoke else 5)
        print(json.dumps({
            "stage": "trba_decode", "mode": "greedy",
            "cumulative_ms": round(t * 1e3, 2),
            "stage_ms": round((t - results["trba_encode"]) * 1e3, 2),
        }), flush=True)

    return results


if __name__ == "__main__":
    main()
