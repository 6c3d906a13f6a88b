"""manuscript_tpu — TPU-native OCR framework for historical manuscripts.

A ground-up JAX/XLA/Pallas rebuild with the full capability surface of the
manuscript-ocr reference (EAST detector + TRBA recognizer + Pipeline), built
TPU-first: jit-compiled static-shape device programs, mesh-sharded batch
parallelism, and native host kernels where serial post-processing is
unavoidable.

Public API parity (reference: src/manuscript/__init__.py:1-4):
``Pipeline``, ``visualize_page``, ``read_image`` at the package root, plus
``manuscript_tpu.detectors.EAST`` and ``manuscript_tpu.recognizers.TRBA``.
"""

from ._version import __version__
from .ops.image import read_image
from .pipeline import Pipeline
from .types import Block, Page, Word
from .utils.visualize import visualize_page

__all__ = [
    "Pipeline",
    "visualize_page",
    "read_image",
    "Word",
    "Block",
    "Page",
    "__version__",
]
