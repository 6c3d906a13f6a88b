"""Smoke-train TRBA on synthetic rendered words — validates the full
training stack (data pipeline, SPMD train step, eval decode, checkpoints)
end to end on real hardware and should reach high accuracy in ~2 minutes.

Usage: python examples/train_synthetic.py [workdir]
"""

import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw, ImageFont

WORDS = [
    "the", "old", "manuscript", "text", "word", "page", "line", "quill",
    "ink", "scribe", "letter", "codex", "folio", "margin", "glyph", "seal",
]


def render_word(word: str, rng: np.random.Generator) -> np.ndarray:
    try:
        font = ImageFont.load_default(size=22)
    except TypeError:  # older PIL
        font = ImageFont.load_default()
    w = 12 * len(word) + 16
    img = Image.new("RGB", (w, 32), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    draw.text((6, 4), word, fill=(0, 0, 0), font=font)
    arr = np.array(img)
    noise = rng.normal(0, 6, arr.shape)
    return np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def build_dataset(root: Path, n: int, seed: int = 0):
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        word = WORDS[int(rng.integers(len(WORDS)))]
        name = f"w{i:05d}.png"
        Image.fromarray(render_word(word, rng)).save(img_dir / name)
        rows.append(f"{name}\t{word}")
    tsv = root / "labels.tsv"
    tsv.write_text("\n".join(rows))
    return str(tsv), str(img_dir)


def main():
    from manuscript_tpu.recognizers import TRBA

    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "./synthetic_run")
    tsv, img_dir = build_dataset(workdir / "data", n=600)

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
