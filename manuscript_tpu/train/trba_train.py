"""TRBA training loop — jit-compiled SPMD teacher-forced training.

Capability parity with the reference trainer (reference:
src/manuscript/recognizers/_trba/training/train.py:66-1097): JSON-or-dict
Config with auto expN experiment dirs and resume-merge, freeze policies
(cnn / enc_rnn / attention × none / partial / full) as optax gradient masks,
CE(ignore PAD), Adam/AdamW/SGD with plateau/cosine/none schedules,
per-dataset separate-val-or-random-split, proportional multi-dataset
batching, greedy (and optional beam) eval with Acc/CER/WER per val set +
aggregate, metrics_epoch.csv, TensorBoard, and the three checkpoint families
(last / best-loss / best-acc) as full-state + weights-only artifacts with
itos/config embedded.

TPU-first: one jitted train step (batch data-sharded over the mesh, params
replicated — XLA all-reduces gradients over ICI); eval decode reuses the
recognizer's fixed-bucket greedy program. bf16 is the AMP equivalent: set
``compute_dtype="bfloat16"``; master weights stay f32.
"""

from __future__ import annotations

import csv
import json
import re
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.trba import TRBAModel
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..recognizers.charset import (
    BLANK_TOKEN,
    EOS_TOKEN,
    PAD_TOKEN,
    SOS_TOKEN,
    decode_tokens,
    default_charset,
    load_charset,
)
from .losses import trba_ce_loss
from .metrics import aggregate_text_metrics
from .optim import build_trba_optimizer
from .trba_dataset import (
    AugmentParams,
    OCRDataset,
    collate_attention,
    proportional_batches,
)

FREEZE_POLICIES = ("none", "partial", "full")


class Config:
    """JSON-or-dict config with attribute access, expN auto-naming, save(),
    and resume-merge (old experiment config under new overrides)."""

    DEFAULTS = dict(
        exp_root="./experiments",
        exp_name=None,
        charset_path=None,
        max_len=25,
        hidden_size=256,
        img_h=64,
        img_w=256,
        cnn_stage_plan="full",  # full | tiny | micro (seresnet31.STAGE_PLANS)
        batch_size=64,
        epochs=100,
        lr=1e-3,
        optimizer="adam",
        weight_decay=0.0,
        grad_clip=5.0,
        scheduler="plateau",  # plateau | cosine | none
        plateau_factor=0.5,
        plateau_patience=5,
        compute_dtype="float32",
        freeze_cnn="none",
        freeze_enc_rnn="none",
        freeze_attention="none",
        pretrained_path=None,
        val_size=0.1,
        proportions=None,
        aug_params=None,
        eval_beam=False,
        beam_size=8,
        beam_alpha=0.9,
        beam_temperature=1.7,
        ss_prob=0.0,  # scheduled-sampling probability (reference model.py:287-320)
        seed=0,
        early_stop=50,
        n_devices=None,
        resume=None,
        charset_strict=True,
    )

    def __init__(self, payload: Union[str, Dict, None] = None, **overrides):
        data = dict(self.DEFAULTS)
        if isinstance(payload, str):
            with open(payload, "r", encoding="utf-8") as f:
                data.update(json.load(f))
        elif isinstance(payload, dict):
            data.update(payload)
        data.update(overrides)

        # resume: merge the old experiment's config under the new overrides
        if data.get("resume"):
            old_cfg = Path(data["resume"]) / "config.json"
            if old_cfg.exists():
                with open(old_cfg, "r", encoding="utf-8") as f:
                    old = json.load(f)
                merged = dict(self.DEFAULTS)
                merged.update(old)
                if isinstance(payload, dict):
                    merged.update(payload)
                merged.update(overrides)
                merged["resume"] = data["resume"]
                data = merged

        self._data = data
        if not data.get("exp_name"):
            data["exp_name"] = self._next_exp_name(data["exp_root"])
        self.exp_dir = Path(data["exp_root"]) / data["exp_name"]

    @staticmethod
    def _next_exp_name(root: str) -> str:
        root_p = Path(root)
        existing = []
        if root_p.exists():
            for d in root_p.iterdir():
                m = re.fullmatch(r"exp(\d+)", d.name)
                if m:
                    existing.append(int(m.group(1)))
        return f"exp{max(existing, default=0) + 1}"

    def __getattr__(self, name):
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        raise AttributeError(name)

    def to_dict(self) -> Dict:
        return dict(self._data)

    def save(self) -> None:
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        with open(self.exp_dir / "config.json", "w", encoding="utf-8") as f:
            json.dump(self._data, f, ensure_ascii=False, indent=2, default=str)


def _as_list(x) -> List:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


def freeze_mask(params, cfg: Config):
    """optax mask: True → trainable. Policy semantics (reference:
    configs/freeze_policies.md + train.py:352-476): 'full' freezes the whole
    module; 'partial' freezes its lower half (early CNN stages, first
    BiLSTM, the attention cell but not the generator)."""

    def decide(path) -> bool:
        keys = [str(getattr(p, "key", p)) for p in path]
        top = keys[0] if keys else ""
        if top == "cnn":
            pol = cfg.freeze_cnn
            if pol == "full":
                return False
            if pol == "partial":
                early = ("stem_", "layer1_", "layer2_")
                return not any(keys[1].startswith(e) for e in early)
            return True
        if top in ("enc_rnn1", "enc_rnn2"):
            pol = cfg.freeze_enc_rnn
            if pol == "full":
                return False
            if pol == "partial":
                return top == "enc_rnn2"
            return True
        if top == "decoder":
            pol = cfg.freeze_attention
            if pol == "full":
                return False
            if pol == "partial":
                return keys[1].startswith("gen_")
            return True
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def make_train_step(model: TRBAModel, tx, pad_id: int, ss_prob: float = 0.0):
    @partial(jax.jit, donate_argnums=(0, 2))
    def step(
        params, batch_stats, opt_state, rng, lr_scale, image_u8, text_in, target_y
    ):
        def loss_fn(p):
            x = (image_u8.astype(model.dtype) / 255.0 - 0.5) / 0.5
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                text_in,
                train=True,
                ss_prob=ss_prob,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return trba_ce_loss(logits, target_y, pad_id), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # failure guard: non-finite loss skips the update
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        # plateau scheduler: traced multiplicative lr scale on the final step
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss

    return step


def make_eval_loss_step(model: TRBAModel, pad_id: int):
    @jax.jit
    def step(params, batch_stats, image_u8, text_in, target_y):
        x = (image_u8.astype(model.dtype) / 255.0 - 0.5) / 0.5
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, text_in, train=False
        )
        return trba_ce_loss(logits, target_y, pad_id)

    return step


def make_greedy_step(model: TRBAModel, max_len: int):
    @jax.jit
    def step(params, batch_stats, image_u8):
        x = (image_u8.astype(model.dtype) / 255.0 - 0.5) / 0.5
        _, preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            max_len=max_len,
            method="greedy",
        )
        return preds

    return step


def make_beam_step(
    model: TRBAModel, max_len: int, beam_size: int, alpha: float,
    temperature: float,
):
    """Per-epoch beam-decode eval program (reference train.py:753-910 runs
    an optional beam decode over each val set alongside greedy)."""

    @jax.jit
    def step(params, batch_stats, image_u8):
        x = (image_u8.astype(model.dtype) / 255.0 - 0.5) / 0.5
        _, preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            max_len=max_len,
            beam_size=beam_size,
            alpha=alpha,
            temperature=temperature,
            method="beam",
        )
        return preds

    return step


def _pad_batch(batch: Dict[str, np.ndarray], to: int) -> Tuple[Dict, int]:
    n = batch["image"].shape[0]
    if n == to:
        return batch, n
    reps = {k: np.concatenate([v, np.repeat(v[-1:], to - n, axis=0)])
            for k, v in batch.items() if isinstance(v, np.ndarray)}
    return reps, n


def train(
    train_csvs: Union[str, Sequence[str]] = None,
    train_roots: Union[str, Sequence[str]] = None,
    val_csvs: Optional[Union[str, Sequence[str]]] = None,
    val_roots: Optional[Union[str, Sequence[str]]] = None,
    config: Union[str, Dict, Config, None] = None,
    **overrides,
) -> Dict[str, Any]:
    """High-level TRBA training. Returns {"val_acc","val_loss","exp_dir"}."""
    cfg = config if isinstance(config, Config) else Config(config, **overrides)
    cfg.save()
    rng_np = np.random.default_rng(cfg.seed)

    log_path = cfg.exp_dir / "train.log"

    def log(msg: str):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line)
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(line + "\n")

    # ---- charset ----
    if cfg.charset_path:
        itos, stoi = load_charset(cfg.charset_path)
    else:
        itos = default_charset()
        stoi = {s: i for i, s in enumerate(itos)}
    pad_id, sos_id, eos_id = stoi[PAD_TOKEN], stoi[SOS_TOKEN], stoi[EOS_TOKEN]
    blank_id = stoi.get(BLANK_TOKEN)

    # ---- datasets ----
    aug = AugmentParams.from_config(cfg.aug_params or {})
    train_sets, val_sets = [], []
    t_csvs, t_roots = _as_list(train_csvs), _as_list(train_roots)
    v_csvs, v_roots = _as_list(val_csvs), _as_list(val_roots)

    for i, (csv_path, root) in enumerate(zip(t_csvs, t_roots)):
        ds = OCRDataset(
            csv_path, root, stoi, max_len=cfg.max_len, img_h=cfg.img_h,
            img_w=cfg.img_w, augment=True, augment_params=aug,
            charset_strict=cfg.charset_strict, seed=cfg.seed + i,
        )
        if i < len(v_csvs):
            vs = OCRDataset(
                v_csvs[i], v_roots[i], stoi, max_len=cfg.max_len,
                img_h=cfg.img_h, img_w=cfg.img_w, augment=False,
                charset_strict=cfg.charset_strict,
            )
            train_sets.append(ds)
            val_sets.append(vs)
        else:
            # random split val_size off the training set
            n_val = max(1, int(len(ds) * cfg.val_size))
            idx = rng_np.permutation(len(ds))
            val_view = _SubsetDataset(ds, idx[:n_val], augment=False)
            train_view = _SubsetDataset(ds, idx[n_val:])
            train_sets.append(train_view)
            val_sets.append(val_view)

    if not train_sets:
        raise ValueError("No training datasets provided")

    # ---- model ----
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = TRBAModel(
        num_classes=len(itos), hidden_size=cfg.hidden_size,
        sos_id=sos_id, eos_id=eos_id, pad_id=pad_id, blank_id=blank_id,
        dtype=dtype, cnn_stage_plan=cfg.cnn_stage_plan,
    )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(
            jax.random.PRNGKey(cfg.seed),
            jnp.zeros((1, cfg.img_h, cfg.img_w, 3), jnp.float32),
            jnp.zeros((1, cfg.max_len + 1), jnp.int32),
        )
    params, batch_stats = variables["params"], variables["batch_stats"]

    if cfg.pretrained_path:
        from ..utils.convert import convert_trba, load_torch_state_dict, merge_converted

        try:
            if str(cfg.pretrained_path).endswith(".pth"):
                state = load_torch_state_dict(cfg.pretrained_path)
                merged = merge_converted(
                    {"params": params, "batch_stats": batch_stats},
                    convert_trba(state),
                )
            else:
                with open(cfg.pretrained_path, "rb") as f:
                    merged = flax.serialization.from_bytes(
                        {"params": params, "batch_stats": batch_stats}, f.read()
                    )
            params, batch_stats = merged["params"], merged["batch_stats"]
            log(f"loaded pretrained weights from {cfg.pretrained_path}")
        except Exception as e:  # tolerant load: warn + random init
            log(f"pretrained load failed ({e}); continuing with random init")

    # ---- optimizer / schedule ----
    steps_per_epoch = max(
        1, sum(len(d) for d in train_sets) // cfg.batch_size
    )
    schedule = None
    plateau_lr_scale = {"scale": 1.0}
    if cfg.scheduler == "cosine":
        schedule = optax.cosine_decay_schedule(
            cfg.lr, cfg.epochs * steps_per_epoch, alpha=0.01
        )
    tx = build_trba_optimizer(
        cfg.optimizer, cfg.lr, cfg.weight_decay, cfg.grad_clip, schedule
    )

    mask = freeze_mask(params, cfg)
    if not all(jax.tree_util.tree_leaves(mask)):
        tx = optax.masked(tx, mask)
        log("freeze policies active: "
            f"cnn={cfg.freeze_cnn} enc_rnn={cfg.freeze_enc_rnn} "
            f"attention={cfg.freeze_attention}")
    opt_state = tx.init(params)

    # ---- mesh / sharding ----
    mesh = make_mesh(n_devices=cfg.n_devices)
    n_data = mesh.shape["data"]
    params = replicate(params, mesh)
    batch_stats = replicate(batch_stats, mesh)
    opt_state = replicate(opt_state, mesh)

    train_step = make_train_step(model, tx, pad_id, ss_prob=cfg.ss_prob)
    eval_loss_step = make_eval_loss_step(model, pad_id)
    greedy_step = make_greedy_step(model, cfg.max_len)
    beam_step = (
        make_beam_step(model, cfg.max_len, cfg.beam_size, cfg.beam_alpha,
                       cfg.beam_temperature)
        if cfg.eval_beam
        else None
    )

    # ---- resume ----
    start_epoch = 0
    best_val_loss, best_val_acc, patience = float("inf"), -1.0, 0
    ckpt_dir = cfg.exp_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if cfg.resume:
        state_file = Path(cfg.resume) / "checkpoints" / "last_state.msgpack"
        if state_file.exists():
            template = {
                "params": params, "batch_stats": batch_stats,
                "opt_state": opt_state,
                "meta": {"epoch": 0, "best_val_loss": 0.0,
                         "best_val_acc": 0.0, "patience": 0},
            }
            restored = flax.serialization.from_bytes(
                template, state_file.read_bytes()
            )
            params = replicate(restored["params"], mesh)
            batch_stats = replicate(restored["batch_stats"], mesh)
            try:
                opt_state = replicate(restored["opt_state"], mesh)
            except Exception as e:
                log(f"optimizer state restore failed ({e}); weights-only resume")
            meta = restored["meta"]
            start_epoch = int(meta["epoch"])
            best_val_loss = float(meta["best_val_loss"])
            best_val_acc = float(meta["best_val_acc"])
            patience = int(meta["patience"])
            log(f"resumed from {state_file} at epoch {start_epoch}")

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=str(cfg.exp_dir / "tb"))
    except Exception:
        pass

    metrics_csv = cfg.exp_dir / "metrics_epoch.csv"
    csv_fields = ["epoch", "train_loss", "val_loss", "val_acc", "val_cer",
                  "val_wer", "val_beam_acc", "val_beam_cer", "val_beam_wer",
                  "lr_scale", "time_s"]
    if not metrics_csv.exists():
        with open(metrics_csv, "w", newline="", encoding="utf-8") as f:
            csv.writer(f).writerow(csv_fields)
    else:
        # resuming into an experiment written before a column change: a
        # mismatched header would silently misalign appended rows — migrate
        # old rows under the current header, padding missing columns
        with open(metrics_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.reader(f))
        if rows and rows[0] != csv_fields:
            old_header, old_rows = rows[0], rows[1:]
            idx = {name: i for i, name in enumerate(old_header)}
            migrated = [
                [
                    (r[idx[name]] if name in idx and idx[name] < len(r) else "")
                    for name in csv_fields
                ]
                for r in old_rows
            ]
            with open(metrics_csv, "w", newline="", encoding="utf-8") as f:
                w = csv.writer(f)
                w.writerow(csv_fields)
                w.writerows(migrated)
            log(
                f"migrated {metrics_csv.name} from {len(old_header)}-column "
                f"to {len(csv_fields)}-column layout"
            )

    proportions = cfg.proportions or [1.0 / len(train_sets)] * len(train_sets)
    rng_key = jax.random.PRNGKey(cfg.seed)

    def save_ckpt(name: str, full_state: bool, epoch: int):
        weights = {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "itos": list(itos),
            "config": {k: v for k, v in cfg.to_dict().items()
                       if isinstance(v, (int, float, str, bool, type(None)))},
        }
        (ckpt_dir / f"{name}.msgpack").write_bytes(
            flax.serialization.to_bytes(weights)
        )
        if full_state:
            state = {
                "params": jax.device_get(params),
                "batch_stats": jax.device_get(batch_stats),
                "opt_state": jax.device_get(opt_state),
                "meta": {"epoch": epoch + 1, "best_val_loss": best_val_loss,
                         "best_val_acc": best_val_acc, "patience": patience},
            }
            (ckpt_dir / f"{name}_state.msgpack").write_bytes(
                flax.serialization.to_bytes(state)
            )

    final_val_acc, final_val_loss = 0.0, float("inf")
    for epoch in range(start_epoch, cfg.epochs):
        t_epoch = time.time()
        losses = []
        for batch_spec in proportional_batches(
            train_sets, proportions, cfg.batch_size, seed=cfg.seed + epoch
        ):
            items = [train_sets[d][i] for d, i in batch_spec]
            batch = collate_attention(items, stoi, cfg.max_len)
            if batch["image"].shape[0] % n_data != 0:
                batch, _ = _pad_batch(
                    batch, -(-batch["image"].shape[0] // n_data) * n_data
                )
            sharded = shard_batch(
                {k: batch[k] for k in ("image", "text_in", "target_y")}, mesh
            )
            rng_key, step_key = jax.random.split(rng_key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, step_key,
                jnp.float32(plateau_lr_scale["scale"]),
                sharded["image"], sharded["text_in"], sharded["target_y"],
            )
            losses.append(loss)
        train_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0

        # ---- validation: TF loss + greedy (± beam) decode per val set ----
        all_refs, all_hyps, all_beam_hyps, vlosses = [], [], [], []
        per_set = {}
        for vs in val_sets:
            refs, hyps, beam_hyps, vl = [], [], [], []
            for start in range(0, len(vs), cfg.batch_size):
                items = [vs[i] for i in range(start, min(start + cfg.batch_size, len(vs)))]
                batch = collate_attention(items, stoi, cfg.max_len)
                padded, n = _pad_batch(batch, cfg.batch_size)
                if cfg.batch_size % n_data == 0:
                    sharded = shard_batch(
                        {k: padded[k] for k in ("image", "text_in", "target_y")},
                        mesh,
                    )
                else:
                    sharded = padded
                vl.append(float(eval_loss_step(
                    params, batch_stats, sharded["image"],
                    sharded["text_in"], sharded["target_y"],
                )))
                preds = np.asarray(
                    greedy_step(params, batch_stats, sharded["image"])
                )[:n]
                hyps.extend(
                    decode_tokens(p, itos, pad_id, eos_id, blank_id)
                    for p in preds
                )
                if beam_step is not None:
                    bpreds = np.asarray(
                        beam_step(params, batch_stats, sharded["image"])
                    )[:n]
                    beam_hyps.extend(
                        decode_tokens(p, itos, pad_id, eos_id, blank_id)
                        for p in bpreds
                    )
                refs.extend(batch["texts"][:n])
            m = aggregate_text_metrics(refs, hyps)
            m["loss"] = float(np.mean(vl)) if vl else 0.0
            if beam_step is not None:
                bm = aggregate_text_metrics(refs, beam_hyps)
                m["beam_accuracy"] = bm["accuracy"]
                m["beam_cer"] = bm["cer"]
                m["beam_wer"] = bm["wer"]
            per_set[getattr(vs, "name", "val")] = m
            all_refs.extend(refs)
            all_hyps.extend(hyps)
            all_beam_hyps.extend(beam_hyps)
            vlosses.append(m["loss"])

        agg = aggregate_text_metrics(all_refs, all_hyps)
        beam_agg = (
            aggregate_text_metrics(all_refs, all_beam_hyps)
            if beam_step is not None
            else None
        )
        val_loss = float(np.mean(vlosses)) if vlosses else float("inf")
        val_acc = agg["accuracy"]
        final_val_acc, final_val_loss = val_acc, val_loss

        # plateau scheduler
        if cfg.scheduler == "plateau":
            if val_loss < best_val_loss - 1e-6:
                plateau_lr_scale["patience"] = 0
            else:
                p = plateau_lr_scale.get("patience", 0) + 1
                plateau_lr_scale["patience"] = p
                if p >= cfg.plateau_patience:
                    plateau_lr_scale["scale"] *= cfg.plateau_factor
                    plateau_lr_scale["patience"] = 0
                    log(f"plateau: lr scale → {plateau_lr_scale['scale']:.4f}")

        # checkpoints
        improved_loss = val_loss < best_val_loss
        improved_acc = val_acc > best_val_acc
        if improved_loss:
            best_val_loss = val_loss
            patience = 0
            save_ckpt("best_loss", full_state=False, epoch=epoch)
        else:
            patience += 1
        if improved_acc:
            best_val_acc = val_acc
            save_ckpt("best_acc", full_state=False, epoch=epoch)
        save_ckpt("last", full_state=True, epoch=epoch)

        dt = time.time() - t_epoch
        log(
            f"epoch {epoch}: train={train_loss:.4f} val={val_loss:.4f} "
            f"acc={val_acc:.4f} cer={agg['cer']:.4f} wer={agg['wer']:.4f} "
            + (
                f"beam_acc={beam_agg['accuracy']:.4f} "
                if beam_agg is not None
                else ""
            )
            + f"({dt:.1f}s)"
        )
        with open(metrics_csv, "a", newline="", encoding="utf-8") as f:
            csv.writer(f).writerow(
                [epoch, train_loss, val_loss, val_acc, agg["cer"], agg["wer"],
                 beam_agg["accuracy"] if beam_agg is not None else "",
                 beam_agg["cer"] if beam_agg is not None else "",
                 beam_agg["wer"] if beam_agg is not None else "",
                 plateau_lr_scale["scale"], round(dt, 2)]
            )
        if writer is not None:
            writer.add_scalar("train/loss", train_loss, epoch)
            writer.add_scalar("val/loss", val_loss, epoch)
            writer.add_scalar("val/acc", val_acc, epoch)
            writer.add_scalar("val/cer", agg["cer"], epoch)
            if beam_agg is not None:
                writer.add_scalar("val/beam_acc", beam_agg["accuracy"], epoch)
                writer.add_scalar("val/beam_cer", beam_agg["cer"], epoch)
            for name, m in per_set.items():
                writer.add_scalar(f"val/{name}/acc", m["accuracy"], epoch)

        if patience >= cfg.early_stop:
            log(f"early stop at epoch {epoch}")
            break

    if writer is not None:
        writer.close()
    return {
        "val_acc": final_val_acc,
        "val_loss": final_val_loss,
        "exp_dir": str(cfg.exp_dir),
        "params": params,
        "batch_stats": batch_stats,
    }


class _SubsetDataset:
    """View over an OCRDataset restricted to an index subset; can disable
    augmentation for validation splits."""

    def __init__(self, base: OCRDataset, indices, augment: Optional[bool] = None):
        self.base = base
        self.indices = np.asarray(indices)
        self._augment = augment
        self.name = getattr(base, "name", "ds") + ("_val" if augment is False else "")

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        if self._augment is None:
            return self.base[int(self.indices[idx])]
        saved = self.base.augment
        self.base.augment = self._augment
        try:
            return self.base[int(self.indices[idx])]
        finally:
            self.base.augment = saved
