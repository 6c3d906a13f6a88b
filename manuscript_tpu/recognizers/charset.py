"""Character set handling and text ↔ token-id codec.

File format and special-token semantics per the reference (reference:
src/manuscript/recognizers/_trba/data/transforms.py:39-59,123-157,196-206):
one token per line; specials <PAD>/<SOS>/<EOS> (and optionally <BLANK>).
``default_charset()`` regenerates the 194-token set shipped with the
reference's released weights (specials, space, latin, digits, Russian
Cyrillic, pre-reform Cyrillic letters, punctuation) so converted checkpoints
keep their class indexing.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD_TOKEN = "<PAD>"
SOS_TOKEN = "<SOS>"
EOS_TOKEN = "<EOS>"
BLANK_TOKEN = "<BLANK>"


def default_charset() -> List[str]:
    """The default 194-token charset (index-compatible with the reference)."""
    tokens = [PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, " "]
    tokens += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    tokens += [chr(c) for c in range(ord("A"), ord("Z") + 1)]
    tokens += [chr(c) for c in range(ord("0"), ord("9") + 1)]
    # modern Russian lowercase: а-е, ё, ж-я
    lower = [chr(c) for c in range(ord("а"), ord("е") + 1)]
    lower += ["ё"] + [chr(c) for c in range(ord("ж"), ord("я") + 1)]
    tokens += lower
    upper = [chr(c) for c in range(ord("А"), ord("Е") + 1)]
    upper += ["Ё"] + [chr(c) for c in range(ord("Ж"), ord("Я") + 1)]
    tokens += upper
    # pre-reform / Old Church Slavonic pairs (lower, upper)
    tokens += list("ѣѢіІѳѲѵѴѫѪѭѬѯѮѱѰѡѠѕЅѧѦѩѨ")
    tokens += list(".,:;!?-–—…«»()[]{}\"'`/\\|_+=*^%$#@&<>~№")
    return tokens


def load_charset(charset_path: str) -> Tuple[List[str], Dict[str, int]]:
    """Read a charset file → (itos, stoi). Blank lines are skipped."""
    itos: List[str] = []
    with open(charset_path, "r", encoding="utf-8") as f:
        for line in f:
            tok = line.rstrip("\n")
            if tok == "":
                continue
            itos.append(tok)
    return itos, {s: i for i, s in enumerate(itos)}


def save_charset(itos: Sequence[str], charset_path: str) -> None:
    with open(charset_path, "w", encoding="utf-8") as f:
        f.write("\n".join(itos) + "\n")


def charset_maps(itos: Sequence[str]) -> Dict[str, int]:
    return {s: i for i, s in enumerate(itos)}


def pack_targets(
    texts: Sequence[str],
    stoi: Dict[str, int],
    max_len: int,
    drop_blank: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build attention-decoder targets.

    Returns (text_in, target_y, lengths):
      text_in  (B, max_len+1): [SOS, ids…, PAD…]   — decoder input
      target_y (B, max_len+1): [ids…, EOS, PAD…]    — CE targets
      lengths  (B,): number of supervised steps (chars + EOS)

    Unknown characters are dropped silently; BLANK ids are dropped when
    ``drop_blank``.
    """
    pad = stoi[PAD_TOKEN]
    sos = stoi[SOS_TOKEN]
    eos = stoi[EOS_TOKEN]
    blank = stoi.get(BLANK_TOKEN)

    b = len(texts)
    t = max_len + 1
    text_in = np.full((b, t), pad, dtype=np.int32)
    text_in[:, 0] = sos
    target_y = np.full((b, t), pad, dtype=np.int32)
    lengths = np.zeros((b,), dtype=np.int32)

    for i, s in enumerate(texts):
        ids = []
        for ch in s:
            idx = stoi.get(ch)
            if idx is None:
                continue
            if drop_blank and blank is not None and idx == blank:
                continue
            ids.append(idx)
        n = min(len(ids), max_len)
        if n > 0:
            text_in[i, 1 : 1 + n] = ids[:n]
            target_y[i, :n] = ids[:n]
        target_y[i, n] = eos
        lengths[i] = n + 1
    return text_in, target_y, lengths


def decode_tokens(
    ids: Sequence[int],
    itos: Sequence[str],
    pad_id: int,
    eos_id: int,
    blank_id: Optional[int] = None,
) -> str:
    """Token ids → string: stop at EOS, skip PAD/BLANK."""
    out = []
    for t in ids:
        t = int(t)
        if t == eos_id:
            break
        if t == pad_id or (blank_id is not None and t == blank_id):
            continue
        out.append(itos[t])
    return "".join(out)
