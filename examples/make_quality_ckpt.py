"""Train + commit the micro quality-gate checkpoints.

Trains micro EAST (resnet50-micro @ 512²) and micro TRBA (hidden 64,
seresnet31 "micro" plan, 32×128 crops) on deterministic synthetic data
(manuscript_tpu/utils/synthetic.py), evaluates them on held-out pages, and
writes the small (~4 MB each) checkpoints into
``manuscript_tpu/configs/quality/`` for bench.py's quality section and
tests/test_quality_gate.py.

The released reference weights are unreachable in the build environment
(zero egress — reference infer.py:96-107 autodownload can't run), so this
synthetic loop is the quality evidence: real training stack → real
checkpoints → real pipeline → CER/F1 with hard thresholds.

Usage: python examples/make_quality_ckpt.py [workdir]
Seeds: training uses 1/2/3; evaluation uses 9000+ (utils/synthetic.py
documents the disjoint seed spaces).
"""

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    from manuscript_tpu.utils.quality import QUALITY_DIR, evaluate_quality
    from manuscript_tpu.utils.synthetic import (
        build_page_dataset,
        build_word_dataset,
    )

    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "./quality_run")
    t0 = time.time()

    # ---- data ----
    tsv, img_dir = build_word_dataset(workdir / "words", n=3000, seed=1)
    tr_coco, tr_pages, _ = build_page_dataset(
        workdir / "pages_train", n_pages=96, seed=2
    )
    va_coco, va_pages, _ = build_page_dataset(
        workdir / "pages_val", n_pages=12, seed=3
    )
    print(f"[data] built in {time.time() - t0:.0f}s", flush=True)

    # ---- TRBA micro ----
    # p_Downscale=0.5: half the training crops are down/re-upsampled to
    # 0.4-0.75× — the fused pipeline samples word crops from the DETECTOR-
    # resolution page, so the recognizer must be robust to ~2× resolution
    # loss (without this aug: host-crop CER 0.04 but fused-crop CER 0.34).
    from manuscript_tpu.recognizers import TRBA

    trba_ckpt = None
    if os.environ.get("QUALITY_SKIP_TRBA") != "1":
        out = TRBA.train(
            tsv,
            img_dir,
            config=dict(
                exp_root=str(workdir / "experiments"),
                exp_name="trba_micro",
                max_len=12,
                hidden_size=64,
                cnn_stage_plan="micro",
                img_h=32,
                img_w=128,
                batch_size=64,
                epochs=40,
                lr=1e-3,
                optimizer="adam",
                scheduler="cosine",
                val_size=0.1,
                early_stop=12,
                aug_params={"p_Downscale": 0.5},
            ),
        )
        print(
            f"[trba] val_acc={out['val_acc']:.3f} ({time.time() - t0:.0f}s)",
            flush=True,
        )
        trba_ckpt = Path(out["exp_dir"]) / "checkpoints" / "best_acc.msgpack"
        if not trba_ckpt.exists():
            trba_ckpt = Path(out["exp_dir"]) / "checkpoints" / "last.msgpack"

    # ---- EAST micro ----
    from manuscript_tpu.detectors import EAST

    east_ckpt = None
    if os.environ.get("QUALITY_SKIP_EAST") != "1":
        eout = EAST.train(
            tr_pages,
            tr_coco,
            va_pages,
            va_coco,
            experiment_root=str(workdir / "experiments"),
            model_name="east_micro",
            backbone="resnet50-micro",
            target_size=512,
            epochs=int(os.environ.get("QUALITY_EAST_EPOCHS", "600")),
            batch_size=8,
            lr=1e-3,
            # RAdam+Lookahead, not SAM-SGD: the micro model must CONVERGE in
            # minutes — SGD at this lr left the geometry regression ~1 cell
            # off per vertex after 60 epochs (r4 first attempt, F1 0.18); the
            # SAM path stays covered by the train-step tests and the dryrun
            use_sam=False,
            use_multiscale=False,
            freeze_first=False,
            early_stop=150,
            val_interval=10,
            log_tensorboard=False,
            ckpt_interval=20,
            # HBM-resident dataset: one upload, device-side jitter —
            # 0.5 s/epoch on the tunneled chip vs ~12 s/epoch streaming
            cache_device=True,
            seed=0,
        )
        print(
            f"[east] best_val_loss={eout['best_val_loss']:.4f} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        east_ckpt = Path(eout["exp_dir"]) / "checkpoints" / "best.msgpack"
        if not east_ckpt.exists():
            east_ckpt = Path(eout["exp_dir"]) / "checkpoints" / "last.msgpack"

    # ---- commit artifacts (QUALITY_SKIP_* reuses the committed one) ----
    QUALITY_DIR.mkdir(parents=True, exist_ok=True)
    if trba_ckpt is not None:
        shutil.copy(trba_ckpt, QUALITY_DIR / "trba_micro.msgpack")
    if east_ckpt is not None:
        shutil.copy(east_ckpt, QUALITY_DIR / "east_micro.msgpack")

    # calibrate score_thresh on one held-out page: best detector F1
    from manuscript_tpu.utils.quality import load_quality_models, score_pages
    from manuscript_tpu.utils.synthetic import eval_pages

    # expand 0.52 = exact inverse of the 0.3 label shrink (see
    # utils/quality.load_quality_models for the derivation); the reference
    # default 0.9 round-trips GT at only 0.60-0.71 IoU on word-shaped quads,
    # which eats the localization margin the IoU-0.5 gate needs.
    (QUALITY_DIR / "east_micro.json").write_text(
        json.dumps(
            {"backbone": "resnet50-micro", "target_size": 512,
             "score_thresh": 0.6, "expand_ratio": 0.52,
             "quantization": 1},
            indent=1,
        )
    )
    east_w, trba_w = load_quality_models()
    cal = eval_pages(2, seed=8000)  # calibration seed ≠ train ≠ eval
    best_t, best_f1 = 0.6, -1.0
    for t in (0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        east_w.score_thresh = t
        preds = [east_w.predict(p)["page"] for p, _ in cal]
        s = score_pages(preds, [g for _, g in cal])
        print(f"[cal] thresh={t}: F1={s['detector_f1']:.3f}", flush=True)
        if s["detector_f1"] > best_f1:
            best_t, best_f1 = t, s["detector_f1"]
    (QUALITY_DIR / "east_micro.json").write_text(
        json.dumps(
            {"backbone": "resnet50-micro", "target_size": 512,
             "score_thresh": best_t, "expand_ratio": 0.52,
             "quantization": 1,
             "calibration_f1": round(best_f1, 4),
             "trained": time.strftime("%Y-%m-%d"),
             "train_seeds": [1, 2, 3], "calibration_seed": 8000},
            indent=1,
        )
    )

    # ---- held-out evaluation (the numbers bench.py will reproduce) ----
    for label, kw in (
        ("fused greedy", dict(mode="greedy")),
        ("fused beam", dict(mode="beam")),
        ("fused beam crop_scale=2", dict(mode="beam", crop_scale=2)),
        ("classic host crops", dict(use_fused=False, mode="greedy")),
    ):
        m = evaluate_quality(n_pages=8, seed=9000, **kw)
        print(
            f"[eval {label}] F1={m['detector_f1']:.3f} "
            f"e2e_CER={m['e2e_cer']:.3f} matched_CER={m['matched_cer']:.3f} "
            f"word_acc={m['word_acc']:.3f}",
            flush=True,
        )
    print(f"done in {time.time() - t0:.0f}s → {QUALITY_DIR}", flush=True)


if __name__ == "__main__":
    main()
