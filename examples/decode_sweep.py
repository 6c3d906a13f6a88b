"""Decode-hyperparameter sweep: maximize recognition accuracy over
mode / beam_size / alpha / temperature (the reference's example3_optuna.py
workflow, using the built-in guided-search Study instead of Optuna).
"""

import os
import sys

from manuscript_tpu.recognizers import TRBA
from manuscript_tpu.train.metrics import compute_accuracy
from manuscript_tpu.train.trba_dataset import read_label_file
from manuscript_tpu.utils.sweep import Study

GT_TSV = sys.argv[1] if len(sys.argv) > 1 else "val/labels.tsv"
IMG_ROOT = sys.argv[2] if len(sys.argv) > 2 else "val/images"
N_TRIALS = int(os.environ.get("N_TRIALS", "30"))


def main():
    rows = read_label_file(GT_TSV)
    paths, refs = [], []
    for name, text in rows:
        p = os.path.join(IMG_ROOT, name)
        if os.path.exists(p):
            paths.append(p)
            refs.append(text)

    model = TRBA()

    def objective(params):
        if params["mode"] == "greedy":
            results = model.predict(paths, mode="greedy")
        else:
            results = model.predict(
                paths,
                mode="beam",
                beam_size=params["beam_size"],
                alpha=params["alpha"],
                temperature=params["temperature"],
            )
        acc = compute_accuracy(refs, [r["text"] for r in results])
        print(f"trial {params} → acc={acc:.4f}")
        return acc

    study = Study(
        space={
            "mode": ("cat", ["greedy", "beam"]),
            "beam_size": ("int", 2, 12),
            "alpha": ("float", 0.0, 1.0),
            "temperature": ("float", 0.7, 2.0),
        },
        storage="decode_sweep_study.json",
        direction="maximize",
    )
    best = study.optimize(objective, N_TRIALS)
    print(f"best: {best}")


if __name__ == "__main__":
    main()
