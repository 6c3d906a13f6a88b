"""Detector demo: detect words, visualize with reading order, profile stages."""

import sys

from manuscript_tpu.detectors import EAST

IMAGE = sys.argv[1] if len(sys.argv) > 1 else "example/ocr_example_image.jpg"


def main():
    detector = EAST(score_thresh=0.6)
    result = detector.predict(
        IMAGE, vis=True, profile=True, sort_reading_order=True
    )
    page = result["page"]
    n = sum(len(b.words) for b in page.blocks)
    print(f"detected {n} words")
    if result["vis_image"] is not None:
        result["vis_image"].save("east_vis.png")
        print("visualization saved to east_vis.png")


if __name__ == "__main__":
    main()
