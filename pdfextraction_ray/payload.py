"""Binary payload codecs for the ``html: binary`` input column.

The corpus schema (BASELINE.json input_hint) carries one opaque binary payload
per page. Two payload kinds, distinguished by a 4-byte magic tag:

- ``HTM1`` — UTF-8 HTML document bytes (the common-crawl case).
- ``WRD1`` — a serialized word-coordinate table, the engine's stand-in for a
  rendered PDF page (the reference's own page representation, see
  reference services/pdf_processor.py:51-83; PyMuPDF is not available in this
  environment so fixtures carry the word table directly — SURVEY.md §7.0).

``WRD1`` layout (little-endian), built for zero-copy numpy decode:

    b"WRD1" | uint32 n
    float32[n] x0 | float32[n] y0 | float32[n] x1 | float32[n] y1
    int32[n] block_no | int32[n] line_no | int32[n] word_no
    uint32[n+1] text offsets | utf8 text blob

Decode cost is one ``np.frombuffer`` per array plus one utf8 split — no
Python-level parsing loop.
"""

from __future__ import annotations

import numpy as np

from .geometry import Word, derive_word

TAG_WORDS = b"WRD1"
TAG_HTML = b"HTM1"

KIND_WORDS = "words"
KIND_HTML = "html"
KIND_UNKNOWN = "unknown"


def payload_kind(payload: bytes) -> str:
    if payload[:4] == TAG_WORDS:
        return KIND_WORDS
    if payload[:4] == TAG_HTML:
        return KIND_HTML
    return KIND_UNKNOWN


def encode_html(html: str) -> bytes:
    return TAG_HTML + html.encode("utf-8")


def decode_html(payload: bytes) -> str:
    assert payload[:4] == TAG_HTML
    return payload[4:].decode("utf-8", errors="replace")


def encode_words(words: list[Word]) -> bytes:
    n = len(words)
    x0 = np.fromiter((w["x0"] for w in words), np.float32, n)
    y0 = np.fromiter((w["y0"] for w in words), np.float32, n)
    x1 = np.fromiter((w["x1"] for w in words), np.float32, n)
    y1 = np.fromiter((w["y1"] for w in words), np.float32, n)
    bno = np.fromiter((w.get("block_no", 0) for w in words), np.int32, n)
    lno = np.fromiter((w.get("line_no", 0) for w in words), np.int32, n)
    wno = np.fromiter((w.get("word_no", 0) for w in words), np.int32, n)
    texts = [w["text"] for w in words]
    blob = "\x00".join(texts).encode("utf-8") if texts else b""
    # offsets are byte offsets into the blob (separator skipped on decode)
    offs = np.zeros(n + 1, np.uint32)
    pos = 0
    for i, t in enumerate(texts):
        b = len(t.encode("utf-8"))
        offs[i] = pos
        pos += b + 1
    offs[n] = pos
    return b"".join([TAG_WORDS, np.uint32(n).tobytes(),
                     x0.tobytes(), y0.tobytes(), x1.tobytes(), y1.tobytes(),
                     bno.tobytes(), lno.tobytes(), wno.tobytes(),
                     offs.tobytes(), blob])


def decode_words(payload: bytes) -> list[Word]:
    assert payload[:4] == TAG_WORDS
    n = int(np.frombuffer(payload, np.uint32, 1, 4)[0])
    off = 8
    f4, i4 = 4 * n, 4 * n
    x0 = np.frombuffer(payload, np.float32, n, off); off += f4
    y0 = np.frombuffer(payload, np.float32, n, off); off += f4
    x1 = np.frombuffer(payload, np.float32, n, off); off += f4
    y1 = np.frombuffer(payload, np.float32, n, off); off += f4
    bno = np.frombuffer(payload, np.int32, n, off); off += i4
    lno = np.frombuffer(payload, np.int32, n, off); off += i4
    wno = np.frombuffer(payload, np.int32, n, off); off += i4
    off += 4 * (n + 1)  # offsets — unused, texts split on the NUL separator
    blob = payload[off:].decode("utf-8")
    texts = blob.split("\x00") if n else []
    # floats promoted to Python float (float64) once here; geometry compares
    # and sorts on these exact values afterwards, deterministically.
    return [derive_word(texts[i], float(x0[i]), float(y0[i]), float(x1[i]),
                        float(y1[i]), int(bno[i]), int(lno[i]), int(wno[i]))
            for i in range(n)]
