"""Sustained REFERENCE-SCALE training on one TPU chip (VERDICT r4 task 2).

The bench's train lines time single steps; this script demonstrates that
the trainers actually TRAIN at the reference's shapes — ≥300 consecutive
steps with descending loss and a working checkpoint/resume — on real
synthetic data (utils.synthetic pages/words, the same generators the
quality checkpoints were trained on):

* EAST: resnet50, bf16 compute, target_size=1024 (reference train.py
  default, detectors/_east/infer.py:415), batch 8, full recipe
  (SAM/ASAM + OHEM + focal-geo + EMA), real rasterized score/geo maps.
* TRBA: hidden 256, the 194-token reference charset, batch 128, 32×128
  crops, max_len 40 (reference recognizers/_trba/configs/config.json),
  bf16 compute, teacher-forced CE.

Each phase prints one JSON line with steps/s + the loss trajectory, saves
a step-indexed orbax checkpoint mid-run, restores it into FRESH state
objects and keeps training — proving the resume path at scale. Exit code
is nonzero if loss fails to descend or the resumed run diverges.

Usage::

    python examples/train_at_scale.py                 # chip, 300 steps each
    python examples/train_at_scale.py --steps 500
    MANUSCRIPT_TPU_BENCH_SMOKE=1 python examples/train_at_scale.py  # CPU self-test
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("MANUSCRIPT_TPU_NO_DOWNLOAD", "1")
os.environ.setdefault("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT", "1")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def emit(metric, **extra):
    print(json.dumps({"metric": metric, **extra}), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--skip-east", action="store_true")
    ap.add_argument("--skip-trba", action="store_true")
    args = ap.parse_args()

    smoke = os.environ.get("MANUSCRIPT_TPU_BENCH_SMOKE") == "1"
    if smoke:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        jax.config.update("jax_disable_most_optimizations", True)
        args.steps = min(args.steps, 12)

    from manuscript_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(
        str(Path(__file__).resolve().parent.parent / ".jax_bench_cache")
    )

    import jax
    import jax.numpy as jnp
    import optax

    backend = jax.default_backend()
    emit("train_at_scale_env", backend=backend, steps=args.steps)

    steps = args.steps
    ok = True

    def check_descent(name, losses, resumed_losses):
        nonlocal ok
        k = max(3, len(losses) // 5)
        first = float(np.mean(losses[:k]))
        last = float(np.mean(losses[-k:]))
        descended = last < first
        resumed_ok = bool(
            np.isfinite(resumed_losses).all()
            and float(np.mean(resumed_losses)) < first
        )
        emit(
            name,
            loss_first=round(first, 4),
            loss_last=round(last, 4),
            descended=descended,
            resumed_mean=round(float(np.mean(resumed_losses)), 4),
            resumed_ok=resumed_ok,
        )
        ok = ok and descended and resumed_ok

    # ---- EAST at reference scale ----------------------------------------
    if not args.skip_east:
        from manuscript_tpu.models.east import EASTModel
        from manuscript_tpu.train.checkpoints import OrbaxCheckpointer
        from manuscript_tpu.train.east_dataset import EASTDataset
        from manuscript_tpu.train.east_train import make_train_step
        from manuscript_tpu.train.optim import build_east_optimizer
        from manuscript_tpu.utils.synthetic import build_page_dataset

        side = 128 if smoke else 1024
        bsz = 2 if smoke else 8
        with tempfile.TemporaryDirectory() as td:
            coco, img_dir, _ = build_page_dataset(
                Path(td) / "pages", n_pages=4 if smoke else 24, seed=0
            )
            ds = EASTDataset(
                img_dir, coco, target_size=side, augment=True, seed=0
            )

            def east_batch(rng):
                idx = rng.integers(0, len(ds), size=bsz)
                imgs, scores, geos = [], [], []
                for i in idx:
                    im, sc, geo, _quads = ds[int(i)]
                    imgs.append(im)
                    scores.append(sc)
                    geos.append(geo)
                return (
                    jnp.asarray(np.stack(imgs)),
                    jnp.asarray(np.stack(scores)),
                    jnp.asarray(np.stack(geos)),
                )

            model = EASTModel(
                backbone="resnet50",
                dtype=jnp.float32 if smoke else jnp.bfloat16,
            )
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
            tx, _ = build_east_optimizer(
                1e-3, steps_per_epoch=100, use_sam=True
            )
            st = {
                "params": variables["params"],
                "bs": variables["batch_stats"],
                "opt": tx.init(variables["params"]),
            }
            st["ema"] = jax.tree_util.tree_map(jnp.copy, st["params"])
            step_fn = make_train_step(
                model, tx, use_sam=True, sam_adaptive=True, use_ohem=True,
                ohem_ratio=0.5, use_focal_geo=True, focal_gamma=2.0,
                use_ema=True,
            )
            rng = np.random.default_rng(0)
            losses = []
            ckpt = OrbaxCheckpointer(str(Path(td) / "ckpt"), max_to_keep=2)
            t0 = None
            for s in range(steps):
                img_b, sc_b, geo_b = east_batch(rng)
                (
                    st["params"], st["bs"], st["opt"], st["ema"], loss
                ) = step_fn(
                    st["params"], st["bs"], st["opt"], st["ema"],
                    img_b, sc_b, geo_b,
                )
                losses.append(float(loss))
                if s == 0:
                    t0 = time.perf_counter()  # exclude the compile
                if s == steps // 2:
                    ckpt.save(s, st, wait=True)
            sps = (steps - 1) / (time.perf_counter() - t0)
            emit(
                "east_scale_train",
                steps=steps,
                steps_per_sec=round(sps, 3),
                config=f"{side}^2 batch {bsz} bf16 SAM+OHEM+focal+EMA, "
                       "real rasterized maps",
            )

            # resume: restore mid-run state into FRESH buffers, train on
            fresh = ckpt.restore(jax.device_get(st))
            st2 = jax.tree_util.tree_map(jnp.asarray, fresh)
            resumed = []
            for s in range(max(10, steps // 10)):
                img_b, sc_b, geo_b = east_batch(rng)
                (
                    st2["params"], st2["bs"], st2["opt"], st2["ema"], loss
                ) = step_fn(
                    st2["params"], st2["bs"], st2["opt"], st2["ema"],
                    img_b, sc_b, geo_b,
                )
                resumed.append(float(loss))
            check_descent("east_scale_loss", losses, np.asarray(resumed))

    # ---- TRBA at reference scale ----------------------------------------
    if not args.skip_trba:
        from manuscript_tpu.models.trba import TRBAModel
        from manuscript_tpu.recognizers.charset import (
            default_charset,
            pack_targets,
        )
        from manuscript_tpu.train.checkpoints import OrbaxCheckpointer
        from manuscript_tpu.train.trba_dataset import OCRDataset
        from manuscript_tpu.train.trba_train import (
            make_train_step as make_trba_step,
        )
        from manuscript_tpu.utils.synthetic import build_word_dataset

        itos = default_charset()
        stoi = {s: i for i, s in enumerate(itos)}
        bsz = 8 if smoke else 128
        max_len = 8 if smoke else 40
        hidden = 32 if smoke else 256
        with tempfile.TemporaryDirectory() as td:
            tsv, root = build_word_dataset(
                Path(td) / "words", n=64 if smoke else 512, seed=0
            )
            ds = OCRDataset(
                tsv, root, stoi, max_len=max_len, img_h=32, img_w=128,
                augment=True, seed=0,
            )

            def trba_batch(rng):
                idx = rng.integers(0, len(ds), size=bsz)
                imgs, texts = [], []
                for i in idx:
                    im, txt = ds[int(i)]
                    imgs.append(im)
                    texts.append(txt)
                text_in, target_y, _ = pack_targets(texts, stoi, max_len)
                return (
                    jnp.asarray(np.stack(imgs)),
                    jnp.asarray(text_in),
                    jnp.asarray(target_y),
                )

            model = TRBAModel(
                num_classes=len(itos),
                hidden_size=hidden,
                dtype=jnp.float32 if smoke else jnp.bfloat16,
            )
            tv = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 32, 128, 3), jnp.float32),
                jnp.zeros((1, max_len + 1), jnp.int32),
            )
            tx = optax.chain(
                optax.clip_by_global_norm(5.0), optax.adam(1e-3)
            )
            st = {
                "params": tv["params"],
                "bs": tv["batch_stats"],
                "opt": tx.init(tv["params"]),
            }
            step_fn = make_trba_step(model, tx, pad_id=stoi["<PAD>"])
            rng = np.random.default_rng(0)
            losses = []
            ckpt = OrbaxCheckpointer(str(Path(td) / "ckpt"), max_to_keep=2)
            t0 = None
            for s in range(steps):
                img_b, tin, ty = trba_batch(rng)
                st["params"], st["bs"], st["opt"], loss = step_fn(
                    st["params"], st["bs"], st["opt"],
                    jax.random.PRNGKey(s), jnp.float32(1.0),
                    img_b, tin, ty,
                )
                losses.append(float(loss))
                if s == 0:
                    t0 = time.perf_counter()
                if s == steps // 2:
                    ckpt.save(s, st, wait=True)
            sps = (steps - 1) / (time.perf_counter() - t0)
            emit(
                "trba_scale_train",
                steps=steps,
                steps_per_sec=round(sps, 3),
                config=f"32x128 batch {bsz} hidden {hidden} classes "
                       f"{len(itos)} len {max_len} bf16, real rendered "
                       "words + aug",
            )

            fresh = ckpt.restore(jax.device_get(st))
            st2 = jax.tree_util.tree_map(jnp.asarray, fresh)
            resumed = []
            for s in range(max(10, steps // 10)):
                img_b, tin, ty = trba_batch(rng)
                st2["params"], st2["bs"], st2["opt"], loss = step_fn(
                    st2["params"], st2["bs"], st2["opt"],
                    jax.random.PRNGKey(10_000 + s), jnp.float32(1.0),
                    img_b, tin, ty,
                )
                resumed.append(float(loss))
            check_descent("trba_scale_loss", losses, np.asarray(resumed))

    emit("train_at_scale_result", ok=ok)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
