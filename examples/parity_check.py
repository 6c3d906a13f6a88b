"""One-command golden-parity harness against the released checkpoints.

This build environment has zero egress, so the released ``.pth`` weights
(reference infer.py:96-107, trba/__init__.py:207-243) can never be fetched
here. On a NETWORKED host this script closes that loop end-to-end:

    # 1. fetch the released artifacts, verify + pin their sha256s
    python examples/parity_check.py --pin-hashes

    # 2. record the golden outputs of this framework on an image
    python examples/parity_check.py --image page.jpg --write-fixture

    # 3. (thereafter, anywhere) re-run and diff tokens/boxes vs the fixture
    python examples/parity_check.py --image page.jpg

Expected output of step 3 on an unchanged build:

    boxes: N matched / N fixture (IoU>=0.7 F1=1.000)
    texts: N/N exact
    PARITY OK

To diff against the PyTorch reference itself, generate the fixture from the
reference instead: run ``Pipeline().predict`` there, save the same JSON
schema ({"words": [{"polygon": [[x,y]*4], "text": str}]}), and point
``--fixture`` at it.

The fixture/pinning machinery itself is exercised END-TO-END in this repo
against the committed synthetic-trained micro models (the released weights
stay unreachable, VERDICT r3 #6):

    # fixture from the quality models on a deterministic synthetic page
    python examples/parity_check.py --quality --synthetic 9100 --write-fixture
    # re-run + diff (tests/test_quality_gate.py runs this in the slow tier)
    python examples/parity_check.py --quality --synthetic 9100

Generate and check the synthetic fixture on the SAME backend (the committed
one is CPU-generated, matching the test environment): greedy decode is
stable there, while CPU↔TPU can differ in low-margin argmaxes.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_FIXTURE = Path(__file__).with_name("parity_fixture.json")


def page_words(page):
    return [
        {"polygon": [[float(x), float(y)] for x, y in w.polygon],
         "text": w.text}
        for b in page.blocks
        for w in b.words
    ]


def axis_iou(p1, p2):
    """Axis-aligned-bbox IoU of two polygons — the package helper is the
    single implementation (tests/test_quality_gate.py imports this name)."""
    from manuscript_tpu.utils.quality import _axis_iou

    return _axis_iou(np.asarray(p1, np.float32), np.asarray(p2, np.float32))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--image", help="page image to OCR")
    ap.add_argument(
        "--synthetic", type=int, metavar="SEED",
        help="use a deterministic utils.synthetic page instead of --image",
    )
    ap.add_argument(
        "--quality", action="store_true",
        help="use the committed synthetic-trained micro models "
             "(manuscript_tpu/configs/quality) instead of released weights",
    )
    ap.add_argument("--fixture", default=str(DEFAULT_FIXTURE))
    ap.add_argument(
        "--mode", choices=("greedy", "beam"), default="greedy",
        help="decode mode recorded in / expected by the fixture",
    )
    ap.add_argument(
        "--max-words", default="64",
        help="fused word capacity ('auto' or an int), recorded in the "
             "fixture",
    )
    ap.add_argument("--write-fixture", action="store_true")
    ap.add_argument("--pin-hashes", action="store_true",
                    help="fetch the released artifacts and pin their sha256s "
                         "into manuscript_tpu/configs/release_hashes.json")
    ap.add_argument("--iou", type=float, default=0.7)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the committed synthetic fixture is "
             "CPU-generated, matching the test environment; jax.config is "
             "the reliable override — the axon TPU registration beats the "
             "JAX_PLATFORMS env var on this host)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # match tests/conftest.py exactly (numerics unchanged either way —
        # see the conftest note; this keeps the environments identical)
        jax.config.update("jax_disable_most_optimizations", True)

    if args.pin_hashes:
        from manuscript_tpu.utils.weights import (
            RELEASES, _sha256_of, fetch_artifact, pin_sha256,
        )

        for name in RELEASES:
            path = fetch_artifact(name)
            if path is None:
                print(f"FAILED to fetch {name} — is this host networked?")
                return 1
            digest = _sha256_of(path)
            pin_sha256(name, digest)
            print(f"pinned {name}: sha256={digest}")
        if not args.image:
            return 0

    if not args.image and args.synthetic is None:
        ap.error("--image or --synthetic is required (unless only pinning hashes)")

    from manuscript_tpu import Pipeline

    if args.quality:
        from manuscript_tpu.utils.quality import load_quality_models

        east, trba = load_quality_models()
        mw = args.max_words if args.max_words == "auto" else int(args.max_words)
        pipe = Pipeline(
            detector=east, recognizer=trba, mode=args.mode, max_words=mw
        )
    else:
        pipe = Pipeline()  # default EAST + TRBA with released weights

    if args.synthetic is not None:
        from manuscript_tpu.utils.synthetic import render_page

        rng = np.random.default_rng(args.synthetic)
        image, _ = render_page(rng)
        source = f"synthetic:{args.synthetic}"
    else:
        image, source = args.image, str(args.image)
    page = pipe.predict(image)
    words = page_words(page)

    if args.write_fixture:
        Path(args.fixture).write_text(
            json.dumps(
                {
                    "image": source,
                    "mode": args.mode,
                    "max_words": args.max_words,
                    "words": words,
                },
                ensure_ascii=False, indent=1,
            )
        )
        print(f"wrote {len(words)} words to {args.fixture}")
        return 0

    fixture = json.loads(Path(args.fixture).read_text())
    fwords = fixture["words"]
    matched, text_ok = 0, 0
    used = set()
    for fw in fwords:
        best, best_iou = None, 0.0
        for i, w in enumerate(words):
            if i in used:
                continue
            iou = axis_iou(fw["polygon"], w["polygon"])
            if iou > best_iou:
                best, best_iou = i, iou
        if best is not None and best_iou >= args.iou:
            used.add(best)
            matched += 1
            if (words[best]["text"] or "") == (fw["text"] or ""):
                text_ok += 1
    prec = matched / max(len(words), 1)
    rec = matched / max(len(fwords), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    print(f"boxes: {matched} matched / {len(fwords)} fixture "
          f"(IoU>={args.iou} F1={f1:.3f})")
    print(f"texts: {text_ok}/{matched} exact")
    ok = f1 >= 0.95 and text_ok >= int(0.95 * max(matched, 1))
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
