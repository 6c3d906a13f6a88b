from .charset import (
    decode_tokens,
    default_charset,
    load_charset,
    pack_targets,
    save_charset,
)
from .trba import TRBA

__all__ = [
    "TRBA",
    "default_charset",
    "load_charset",
    "save_charset",
    "pack_targets",
    "decode_tokens",
]
