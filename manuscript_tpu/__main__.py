"""Command-line interface: page OCR, detection, recognition, benchmarking.

The reference ships no CLI (SURVEY.md §5.6); this one wraps the same public
API for production use:

    python -m manuscript_tpu ocr page.jpg [--out result.json] [--vis vis.png]
    python -m manuscript_tpu detect page.jpg [--thresh 0.6]
    python -m manuscript_tpu recognize crop1.png crop2.png [--mode greedy]
    python -m manuscript_tpu bench
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
import time


def _page_to_dict(page) -> dict:
    return page.model_dump()


def _mesh_from_args(args):
    """Build a data mesh when --n-devices asks for multi-chip inference
    (pages shard over the 'data' axis, weights replicate — the same
    sharded fused program predict_many/serve ride)."""
    if getattr(args, "n_devices", 1) and args.n_devices > 1:
        from .parallel.mesh import make_mesh

        return make_mesh(args.n_devices)
    return None


def cmd_ocr(args):
    from . import Pipeline

    pipe = Pipeline(
        mode=args.mode,
        batch_pages=args.batch_pages,
        max_words=args.max_words,
        crop_scale=args.crop_scale,
        crop_source=args.crop_source,
        mesh=_mesh_from_args(args),
    )
    if len(args.images) > 1 and not args.vis:
        # many pages ride the chunked fused program — one device dispatch
        # per batch_pages pages instead of one per page
        t0 = time.time()
        pages = pipe.process_batch(list(args.images), profile=args.profile)
        dt = time.time() - t0
        for image, page in zip(args.images, pages):
            result = {
                "image": image,
                "seconds": round(dt / len(args.images), 3),
                "text": pipe.get_text(page),
                "page": _page_to_dict(page),
            }
            if args.out:
                out = args.out
                if len(args.images) > 1:
                    # per-image name via pathlib (a dot in a parent dir must
                    # not mangle the path); identical stems from different
                    # dirs get the input index so nothing is overwritten
                    out_path = Path(args.out)
                    stem = Path(image).stem
                    if sum(1 for im in args.images if Path(im).stem == stem) > 1:
                        stem = f"{stem}.{args.images.index(image)}"
                    out = str(
                        out_path.with_name(
                            f"{out_path.stem}.{stem}{out_path.suffix}"
                        )
                    )
                with open(out, "w", encoding="utf-8") as f:
                    json.dump(result, f, ensure_ascii=False, indent=1)
                print(f"{image}: → {out}")
            else:
                print(result["text"])
        return
    for image in args.images:
        t0 = time.time()
        if args.vis:
            page, vis_img = pipe.predict(image, vis=True, profile=args.profile)
            vis_img.save(args.vis)
        else:
            page = pipe.predict(image, profile=args.profile)
        result = {
            "image": image,
            "seconds": round(time.time() - t0, 3),
            "text": pipe.get_text(page),
            "page": _page_to_dict(page),
        }
        if args.out:
            with open(args.out, "w", encoding="utf-8") as f:
                json.dump(result, f, ensure_ascii=False, indent=1)
            print(f"{image}: {result['seconds']}s → {args.out}")
        else:
            print(result["text"])


def cmd_detect(args):
    from .detectors import EAST

    det = EAST(
        weights_path=args.weights,
        target_size=args.target_size,
        score_thresh=args.thresh,
    )
    for image in args.images:
        res = det.predict(image, vis=bool(args.vis), profile=args.profile)
        n = sum(len(b.words) for b in res["page"].blocks)
        print(f"{image}: {n} words")
        if args.vis and res["vis_image"] is not None:
            res["vis_image"].save(args.vis)
        if args.out:
            with open(args.out, "w", encoding="utf-8") as f:
                json.dump(_page_to_dict(res["page"]), f, ensure_ascii=False)


def cmd_recognize(args):
    from .recognizers import TRBA

    rec = TRBA(model_path=args.weights)
    results = rec.predict(
        list(args.images),
        batch_size=args.batch_size,
        mode=args.mode,
        beam_size=args.beam_size,
    )
    for path, r in zip(args.images, results):
        print(f"{path}\t{r['text']}\t{r['confidence']:.4f}")


def cmd_bench(args):
    import runpy
    from pathlib import Path

    bench = Path(__file__).resolve().parent.parent / "bench.py"
    if bench.exists():
        runpy.run_path(str(bench), run_name="__main__")
    else:
        print("bench.py not found next to the package", file=sys.stderr)
        sys.exit(1)


def cmd_sweep_report(args):
    from .utils.sweep import sweep_report

    print(sweep_report(args.storage, out_html=args.out))


def cmd_serve(args):
    from . import Pipeline
    from .serve import OCRServer

    pipe = Pipeline(
        mode=args.mode,
        batch_pages=args.batch_pages,
        max_words=args.max_words,
        crop_source=args.crop_source,
        mesh=_mesh_from_args(args),
    )
    server = OCRServer(
        pipe,
        host=args.host,
        port=args.port,
        batch_wait_ms=args.batch_wait_ms,
        max_queue=args.max_queue,
        request_timeout_s=args.request_timeout_s,
    )
    print(
        f"serving OCR on http://{args.host}:{server.port} "
        f"(micro-batch {server.batch_pages} pages, "
        f"wait {args.batch_wait_ms} ms) — POST /ocr, GET /healthz, /metrics",
        flush=True,
    )
    server.serve_forever()


def main(argv=None):
    # Production cold-start: honor MANUSCRIPT_TPU_JAX_CACHE so a serving
    # host restarts into warm compiles instead of re-lowering the fused
    # page program (env-gated — see utils/compile_cache.py for why this
    # is not safe to default-on for CPU hosts).
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache(None)

    parser = argparse.ArgumentParser(prog="manuscript_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("ocr", help="full-page OCR")
    p.add_argument("images", nargs="+")
    p.add_argument("--out", help="write JSON result")
    p.add_argument("--vis", help="write visualization PNG")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--mode", choices=["beam", "greedy"], default="beam")
    p.add_argument(
        "--batch-pages", type=int, default=4,
        help="pages per fused device program in multi-image runs",
    )
    p.add_argument(
        "--max-words", default="auto",
        type=lambda v: v if v == "auto" else int(v),
        help="recognition capacity per page on the fused path; 'auto' "
             "(default) sizes it to the first page",
    )
    p.add_argument(
        "--crop-scale", type=int, default=1,
        help="k>1 uploads a (k*target)^2 page copy so device-path crops "
             "sample k-times finer than detector resolution (implies "
             "--crop-source device)",
    )
    p.add_argument(
        "--crop-source", choices=["native", "device"], default="native",
        help="'native' (default): two-phase fused path with the "
             "reference's exact native-resolution host crops; 'device': "
             "one-program path cropping from the detector-res copy in HBM",
    )
    p.add_argument(
        "--n-devices", type=int, default=1,
        help="shard pages over an N-device data mesh (multi-chip "
             "inference); batch_pages rounds up to a multiple of N",
    )
    p.set_defaults(func=cmd_ocr)

    p = sub.add_parser("detect", help="text detection only")
    p.add_argument("images", nargs="+")
    p.add_argument("--weights")
    p.add_argument("--thresh", type=float, default=0.6)
    p.add_argument("--target-size", type=int, default=1280)
    p.add_argument("--vis")
    p.add_argument("--out")
    p.add_argument("--profile", action="store_true")
    p.set_defaults(func=cmd_detect)

    p = sub.add_parser("recognize", help="recognize word crops")
    p.add_argument("images", nargs="+")
    p.add_argument("--weights")
    p.add_argument("--mode", choices=["beam", "greedy"], default="beam")
    p.add_argument("--beam-size", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=32)
    p.set_defaults(func=cmd_recognize)

    p = sub.add_parser("bench", help="run the standard benchmark")
    p.set_defaults(func=cmd_bench)

    p = sub.add_parser(
        "sweep-report",
        help="summarize a hyperparameter study (utils.sweep storage) and "
             "optionally render a self-contained HTML report — the "
             "optuna-dashboard analog",
    )
    p.add_argument("storage", help=".json or .db/.sqlite study storage")
    p.add_argument("--out", help="write an HTML report here")
    p.set_defaults(func=cmd_sweep_report)

    p = sub.add_parser(
        "serve", help="HTTP OCR server with micro-batched device dispatch"
    )
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--mode", choices=["beam", "greedy"], default="beam")
    p.add_argument(
        "--batch-pages", type=int, default=4,
        help="max pages coalesced into one fused device program",
    )
    p.add_argument(
        "--batch-wait-ms", type=float, default=25.0,
        help="max extra latency a request pays waiting for batch-mates",
    )
    p.add_argument(
        "--max-words", default="auto",
        type=lambda v: v if v == "auto" else int(v),
    )
    p.add_argument(
        "--crop-source", choices=["native", "device"], default="native",
        help="fused crop source (see 'ocr --crop-source')",
    )
    p.add_argument(
        "--max-queue", type=int, default=64,
        help="bounded admission queue; full queue returns 429",
    )
    p.add_argument(
        "--request-timeout-s", type=float, default=120.0,
        help="end-to-end per-request budget; expiry returns 504",
    )
    p.add_argument(
        "--n-devices", type=int, default=1,
        help="shard each micro-batch over an N-device data mesh "
             "(multi-chip serving); batch_pages rounds up to a multiple of N",
    )
    p.set_defaults(func=cmd_serve)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
