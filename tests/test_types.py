import pytest
from pydantic import ValidationError

from manuscript_tpu.types import Block, Page, Word


def test_word_fields():
    w = Word(polygon=[(0, 0), (1, 0), (1, 1), (0, 1)], detection_confidence=0.5)
    assert w.text is None
    assert w.recognition_confidence is None


def test_confidence_bounds():
    with pytest.raises(ValidationError):
        Word(polygon=[(0, 0)], detection_confidence=1.5)
    with pytest.raises(ValidationError):
        Word(polygon=[(0, 0)], detection_confidence=-0.1)
    with pytest.raises(ValidationError):
        Word(
            polygon=[(0, 0)],
            detection_confidence=0.5,
            recognition_confidence=2.0,
        )


def test_page_structure_roundtrip():
    page = Page(
        blocks=[
            Block(
                words=[
                    Word(
                        polygon=[(0, 0), (2, 0), (2, 2), (0, 2)],
                        detection_confidence=0.9,
                        text="hi",
                        recognition_confidence=0.8,
                    )
                ]
            )
        ]
    )
    data = page.model_dump()
    restored = Page(**data)
    assert restored.blocks[0].words[0].text == "hi"
