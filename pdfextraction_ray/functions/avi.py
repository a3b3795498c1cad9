"""Minimal RIFF/AVI MJPEG container codec — pure struct + numpy, no external
libs. Paired with the baseline JPEG codec (``functions/jpeg.py``) this makes
the video frame-sampling stage REAL: an MJPEG AVI is just a RIFF tree whose
'movi' list holds one baseline-JPEG chunk per frame, the dominant
uncompressed-pipeline interchange shape. Only the structures this engine
emits/needs are implemented (single 'vids' stream, '00dc'/'00db' frame
chunks, optional idx1 which the parser ignores); anything else raises so the
caller can fall back.

Reference behavior analogue: services/vision_extractor.py renders pages to
images for a vision LLM; here the media payloads stay opaque binary columns
and decode happens inside actor-pool map_batches stages
(stages/multimodal.py).
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

from . import jpeg


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def avi_encode(frames: List[np.ndarray], fps: int = 10,
               quality: int = 90) -> bytes:
    """Encode (H, W, 3) uint8 RGB frames (all the same size) into a minimal
    MJPEG AVI. Deterministic bit-for-bit for fixed inputs."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    payloads = [jpeg.jpeg_encode(f, quality=quality) for f in frames]
    max_sz = max(len(p) for p in payloads)

    avih = struct.pack("<14I", 1_000_000 // fps, max_sz * fps, 0, 0x10,
                       len(frames), 0, 1, max_sz, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIiI4H", b"vids", b"MJPG", 0, 0, 0, 0,
                       1, fps, 0, len(frames), max_sz, -1, 0, 0, 0,
                       w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_parts = [b"movi"]
    offsets = []
    off = 4
    for p in payloads:
        offsets.append(off)
        ch = _chunk(b"00dc", p)
        movi_parts.append(ch)
        off += len(ch)
    movi = _chunk(b"LIST", b"".join(movi_parts))

    idx = b"".join(struct.pack("<4sIII", b"00dc", 0x10, off, len(p))
                   for off, p in zip(offsets, payloads))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frames(data: bytes) -> List[bytes]:
    """Extract the per-frame JPEG payloads from an MJPEG AVI ('00dc'/'00db'
    chunks inside the 'movi' list, in container order). Raises ValueError on
    anything that is not a single-movi RIFF/AVI."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    out: List[bytes] = []
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    end = min(end, len(data))
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body_start = pos + 8
        if fourcc == b"LIST" and data[body_start:body_start + 4] == b"movi":
            sub, sub_end = body_start + 4, body_start + size
            while sub + 8 <= min(sub_end, len(data)):
                sc = data[sub:sub + 4]
                ssize = struct.unpack("<I", data[sub + 4:sub + 8])[0]
                if sc in (b"00dc", b"00db"):
                    frame = data[sub + 8:sub + 8 + ssize]
                    if len(frame) < ssize:
                        # declared size runs past the buffer: a truncated
                        # payload must fail HERE, not as a downstream JPEG
                        # decode error on a silently short frame
                        raise ValueError(
                            "truncated frame chunk (declared %d bytes, %d "
                            "available)" % (ssize, len(frame)))
                    out.append(frame)
                sub += 8 + ssize + (ssize % 2)
        pos = body_start + size + (size % 2)
    if not out:
        raise ValueError("no frame chunks in movi list")
    return out
