"""End-to-end training smoke tests on synthetic data (tiny, CPU, 8 virtual
devices — exercises the real SPMD train steps, checkpointing, and resume)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from manuscript_tpu.recognizers.charset import default_charset


def _make_coco_dataset(root, n_images=4, size=128):
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img = np.full((size, size, 3), 230, np.uint8)
        boxes = []
        for b in range(2):
            x0, y0 = 10 + b * 60, 20 + b * 40
            w, h = 40, 20
            img[y0 : y0 + h, x0 : x0 + w] = 40
            boxes.append((x0, y0, w, h))
        name = f"img_{i}.png"
        Image.fromarray(img).save(img_dir / name)
        images.append(
            {"id": i, "file_name": name, "width": size, "height": size}
        )
        for (x0, y0, w, h) in boxes:
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "segmentation": [[x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h]],
                }
            )
            ann_id += 1
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps({"images": images, "annotations": annotations}))
    return str(img_dir), str(ann_file)


def _make_ocr_dataset(root, n=12):
    img_dir = root / "crops"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    words = ["ab", "cd", "ef", "gh"]
    for i in range(n):
        img = rng.integers(150, 255, (24, 64, 3), dtype=np.uint8)
        name = f"w{i}.png"
        Image.fromarray(img).save(img_dir / name)
        rows.append(f"{name}\t{words[i % len(words)]}")
    csv_path = root / "labels.tsv"
    csv_path.write_text("\n".join(rows))
    return str(csv_path), str(img_dir)


@pytest.mark.slow
class TestEASTTraining:
    def test_two_epochs_and_resume(self, tmp_path):
        from manuscript_tpu.train.east_train import train

        img_dir, ann = _make_coco_dataset(tmp_path / "data")
        out = train(
            img_dir, ann, img_dir, ann,
            experiment_root=str(tmp_path / "exp"),
            model_name="t",
            backbone="resnet50",
            target_size=64,
            epochs=2,
            batch_size=2,
            lr=1e-3,
            use_sam=True,
            use_multiscale=False,
            use_ema=True,
            freeze_first=True,
            log_tensorboard=False,
            n_devices=2,
        )
        assert np.isfinite(out["best_val_loss"])
        ckpts = os.listdir(os.path.join(out["exp_dir"], "checkpoints"))
        assert "last.msgpack" in ckpts
        assert "last_state.msgpack" in ckpts
        assert "best.msgpack" in ckpts
        assert len(out["history"]) == 2

        # EMA is consumed, not just computed (VERDICT r1 missing #5):
        # after two update steps the EMA weights must have drifted from the
        # raw weights — validation and best.msgpack use them when use_ema.
        import jax

        raw = jax.tree_util.tree_leaves(out["params"])
        ema = jax.tree_util.tree_leaves(out["ema_params"])
        assert any(
            not np.allclose(np.asarray(r), np.asarray(e))
            for r, e in zip(raw, ema)
        ), "EMA params identical to raw params after training"

        # resume continues from epoch 2; optimizer switched on purpose —
        # opt-state restore must degrade to weights-only, not crash
        out2 = train(
            img_dir, ann, img_dir, ann,
            experiment_root=str(tmp_path / "exp"),
            model_name="t",
            backbone="resnet50",
            target_size=64,
            epochs=3,
            batch_size=2,
            use_sam=False,
            use_lookahead=True,
            use_multiscale=False,
            use_ema=True,
            log_tensorboard=False,
            resume_from=out["exp_dir"],
            n_devices=2,
        )
        assert len(out2["history"]) == 1  # epochs 2→3 only


@pytest.mark.slow
class TestTRBATraining:
    def test_train_eval_resume(self, tmp_path):
        from manuscript_tpu.train.trba_train import Config, train

        csv_path, img_dir = _make_ocr_dataset(tmp_path / "data")
        cfg = dict(
            exp_root=str(tmp_path / "exp"),
            exp_name="trba_t",
            max_len=6,
            hidden_size=32,
            img_h=32,
            img_w=64,
            batch_size=4,
            epochs=2,
            lr=1e-3,
            scheduler="plateau",
            val_size=0.25,
            early_stop=10,
            n_devices=2,
        )
        out = train(csv_path, img_dir, config=cfg)
        assert 0.0 <= out["val_acc"] <= 1.0
        exp = out["exp_dir"]
        ckpts = os.listdir(os.path.join(exp, "checkpoints"))
        assert "last.msgpack" in ckpts and "last_state.msgpack" in ckpts
        assert os.path.exists(os.path.join(exp, "metrics_epoch.csv"))
        assert os.path.exists(os.path.join(exp, "train.log"))
        assert os.path.exists(os.path.join(exp, "config.json"))

        # resume: merges old config, continues epochs
        out2 = train(
            csv_path, img_dir,
            config=dict(cfg, exp_name="trba_t2", epochs=3, resume=exp),
        )
        assert out2["val_acc"] >= 0.0

    def test_eval_beam_and_scheduled_sampling(self, tmp_path):
        """VERDICT r1 #7: eval_beam runs the beam program on the val set each
        epoch (beam columns land in metrics_epoch.csv); ss_prob>0 trains with
        scheduled sampling (reference model.py:287-320) and stays finite."""
        import csv as csv_mod

        from manuscript_tpu.train.trba_train import train

        csv_path, img_dir = _make_ocr_dataset(tmp_path / "data", n=8)
        out = train(
            csv_path, img_dir,
            config=dict(
                exp_root=str(tmp_path / "exp"),
                exp_name="beam_ss",
                max_len=6,
                hidden_size=32,
                img_h=32,
                img_w=64,
                batch_size=4,
                epochs=1,
                eval_beam=True,
                beam_size=2,
                ss_prob=0.5,
                val_size=0.25,
                n_devices=2,
            ),
        )
        assert np.isfinite(out["val_loss"])
        with open(os.path.join(out["exp_dir"], "metrics_epoch.csv")) as f:
            rows = list(csv_mod.DictReader(f))
        assert rows, "metrics_epoch.csv has no data rows"
        beam_acc = float(rows[-1]["val_beam_acc"])
        assert 0.0 <= beam_acc <= 1.0
        assert float(rows[-1]["val_beam_cer"]) >= 0.0

    def test_freeze_policies_and_proportional(self, tmp_path):
        from manuscript_tpu.train.trba_train import train

        csv1, root1 = _make_ocr_dataset(tmp_path / "d1", n=8)
        csv2, root2 = _make_ocr_dataset(tmp_path / "d2", n=8)
        out = train(
            [csv1, csv2],
            [root1, root2],
            config=dict(
                exp_root=str(tmp_path / "exp"),
                exp_name="frz",
                max_len=6,
                hidden_size=32,
                img_h=32,
                img_w=64,
                batch_size=4,
                epochs=1,
                freeze_cnn="partial",
                freeze_enc_rnn="full",
                freeze_attention="partial",
                proportions=[0.5, 0.5],
                val_size=0.25,
                n_devices=2,
            ),
        )
        assert np.isfinite(out["val_loss"])


class TestConfig:
    def test_exp_autoname(self, tmp_path):
        from manuscript_tpu.train.trba_train import Config

        c1 = Config({"exp_root": str(tmp_path)})
        assert c1.exp_name == "exp1"
        c1.save()
        c2 = Config({"exp_root": str(tmp_path)})
        assert c2.exp_name == "exp2"

    def test_json_roundtrip(self, tmp_path):
        from manuscript_tpu.train.trba_train import Config

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"max_len": 40, "img_h": 32}))
        c = Config(str(p), exp_root=str(tmp_path))
        assert c.max_len == 40
        assert c.img_h == 32
        assert c.batch_size == Config.DEFAULTS["batch_size"]

    def test_resume_merge(self, tmp_path):
        from manuscript_tpu.train.trba_train import Config

        old = Config({"exp_root": str(tmp_path), "exp_name": "old", "lr": 0.5})
        old.save()
        c = Config({"exp_root": str(tmp_path), "resume": str(old.exp_dir)},
                   batch_size=8)
        assert c.lr == 0.5  # inherited from old experiment
        assert c.batch_size == 8  # override wins


@pytest.mark.slow
class TestEASTCacheDevice:
    def test_cache_device_training(self, tmp_path):
        """cache_device=True: HBM-resident dataset, device-side jitter,
        ckpt_interval throttling — same trainer contract as the host path."""
        from manuscript_tpu.train.east_train import train

        img_dir, ann = _make_coco_dataset(tmp_path / "data")
        out = train(
            img_dir, ann, img_dir, ann,
            experiment_root=str(tmp_path / "exp"),
            model_name="tc",
            backbone="resnet50-micro",
            target_size=64,
            epochs=3,
            batch_size=2,
            lr=1e-3,
            use_sam=False,
            use_multiscale=True,  # device-side jax.image.resize path
            use_ema=False,
            freeze_first=False,
            # exercises the device-cached collage logging branch — it once
            # unpacked the dataset 4-tuple into 3 names and crashed the
            # first validation epoch (r4 review finding)
            log_tensorboard=True,
            cache_device=True,
            ckpt_interval=2,
            n_devices=2,
        )
        assert np.isfinite(out["best_val_loss"])
        assert len(out["history"]) == 3
        ckpts = os.listdir(os.path.join(out["exp_dir"], "checkpoints"))
        # epoch 2 hit the interval; epoch 3 == epochs (final) also writes
        assert "last_state.msgpack" in ckpts and "best.msgpack" in ckpts
