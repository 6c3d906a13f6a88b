"""Per-stage device times for the fused page program, on the live backend.

VERDICT r3 weak #3/#5: before attacking MFU, measure where the fused
program's time actually goes ON THE CHIP. Stage programs are CUMULATIVE
prefixes of the EXACT production program — ``FusedOCR._build_program``
takes ``stop_after=<stage>`` and truncates itself after that stage,
returning a data-dependent f32 scalar — so the profile can never drift
from what ``predict`` actually runs (an earlier version hand-mirrored the
builder here; review flagged the drift risk). Stages: EAST forward;
+decode/compact; +LANMS; +postprocess/select/crop; +TRBA CNN; +TRBA
encode; +TRBA decode (greedy and beam).

Each cumulative program is timed with the differential-chain method (the
tunnel's ``block_until_ready`` is unreliable; see BASELINE.md r2
methodology): iteration i+1's score threshold data-depends on iteration
i's scalar output (``thresh + carry*1e-30``, a value no-op), so the
per-iteration differential cancels dispatch + d2h overheads. Stage time =
cumulative(depth) − cumulative(depth−1).

The profiled program is built with ``transport="raw"``/``crop_scale=1``:
inputs start as a device-resident uint8 page (device-only methodology —
transport decode is a link concern, measured in bench.py instead).

Run plain for the TPU measurement (one JSON line per stage); smoke mode
(MANUSCRIPT_TPU_BENCH_SMOKE=1) runs tiny shapes on CPU to validate the
harness itself.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")


from _timing import chain_time  # noqa: E402  (differential-chain method)


STAGES = [
    "east_forward",
    "decode_compact",
    "lanms",
    "postprocess_crop",
    "trba_cnn",
    "trba_encode",
    "trba_decode",
]


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
    # raw transport + crop_scale=1: the program's inputs are a single
    # device-resident page (see module docstring)
    fused = FusedOCR(
        east, trba, max_words=8 if smoke else max_words,
        transport="raw", crop_scale=1,
    )
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

    def chained(stage: str, mode: str):
        # truncate the PRODUCTION builder after `stage`; `mode` only
        # matters for the trba_decode tail (greedy vs beam comparison)
        prev_mode = fused.mode
        fused.mode = mode
        try:
            stage_fn = fused._build_program(stop_after=stage)
        finally:
            fused.mode = prev_mode

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
                    jnp.float32(thresh) + carry * jnp.float32(1e-30),
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
    for name in STAGES:
        mode = fused.mode if name == "trba_decode" else "greedy"
        run = chained(name, mode)
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
        run = chained("trba_decode", "greedy")
        t = chain_time(run, n_lo, n_hi, repeats=3 if smoke else 5)
        print(json.dumps({
            "stage": "trba_decode", "mode": "greedy",
            "cumulative_ms": round(t * 1e3, 2),
            "stage_ms": round((t - results["trba_encode"]) * 1e3, 2),
        }), flush=True)

    return results


if __name__ == "__main__":
    main()
