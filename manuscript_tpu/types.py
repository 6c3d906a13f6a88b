"""Data contract for OCR results.

Mirrors the reference DTOs (reference: src/manuscript/detectors/_types.py:5-33):
``Word`` carries a polygon + detection confidence and, after recognition,
``text`` + ``recognition_confidence``; ``Block`` groups words; ``Page`` groups
blocks. Field names and validation ranges are preserved so downstream users of
the reference can switch without changes.
"""

from typing import List, Optional, Tuple

from pydantic import BaseModel, Field


class Word(BaseModel):
    polygon: List[Tuple[float, float]] = Field(
        ..., description="Vertices (x, y) of the polygon bounding the region"
    )
    detection_confidence: float = Field(
        ..., ge=0.0, le=1.0, description="Detector confidence score"
    )
    text: Optional[str] = Field(
        None, description="Recognized text (filled in by the pipeline)"
    )
    recognition_confidence: Optional[float] = Field(
        None, ge=0.0, le=1.0, description="Recognizer confidence score"
    )


class Block(BaseModel):
    """A group of words forming one text block."""

    words: List[Word]


class Page(BaseModel):
    """A document page: one or more text blocks."""

    blocks: List[Block]
