"""Quick-start: full-page OCR with the default pipeline.

Equivalent of the reference's pipline_infer.py quick-start. Point IMAGE at a
manuscript page; weights load from ~/.manuscript_tpu/ caches or explicit
paths (torch .pth checkpoints from the reference convert automatically).
"""

import sys

from manuscript_tpu import Pipeline

IMAGE = sys.argv[1] if len(sys.argv) > 1 else "example/ocr_example_image.jpg"


def main():
    pipeline = Pipeline()
    page = pipeline.predict(IMAGE, profile=True)
    print(pipeline.get_text(page))


if __name__ == "__main__":
    main()
