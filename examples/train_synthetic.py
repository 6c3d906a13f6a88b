"""Smoke-train TRBA on synthetic rendered words — validates the full
training stack (data pipeline, SPMD train step, eval decode, checkpoints)
end to end on real hardware and should reach high accuracy in ~2 minutes.

Usage: python examples/train_synthetic.py [workdir]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from manuscript_tpu.recognizers import TRBA
    from manuscript_tpu.utils.synthetic import build_word_dataset

    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "./synthetic_run")
    tsv, img_dir = build_word_dataset(workdir / "data", n=600)

    t0 = time.time()
    out = TRBA.train(
        tsv,
        img_dir,
        config=dict(
            exp_root=str(workdir / "experiments"),
            exp_name="synthetic",
            max_len=12,
            hidden_size=128,
            img_h=32,
            img_w=128,
            batch_size=64,
            epochs=12,
            lr=1e-3,
            optimizer="adam",
            scheduler="cosine",
            val_size=0.15,
            early_stop=20,
        ),
    )
    print(
        f"done in {time.time() - t0:.0f}s: val_acc={out['val_acc']:.3f} "
        f"val_loss={out['val_loss']:.3f} exp_dir={out['exp_dir']}"
    )
    return out


if __name__ == "__main__":
    main()
