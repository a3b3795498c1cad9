"""Pure-stdlib media codecs (zlib/struct/wave + numpy) so the multimodal
stages have REAL decode kernels in environments without PIL/soundfile.

- PNG: 8-bit-depth, non-interlaced, color types 0 (grey), 2 (RGB),
  3 (palette), 4 (grey+alpha), 6 (RGBA); all five scanline filters. The
  encoder (filter 0) exists for fixtures/tests and round-trips losslessly.
- WAV: integer PCM (8/16/32-bit) via the stdlib ``wave`` module, mixed to
  mono float32 in [-1, 1].

These cover the dominant lossless web formats; baseline JPEG decodes via the
sibling ``functions/jpeg.py`` (numpy DCT + table-driven Huffman); MP3/video
remain library-gated (see stages/multimodal.py).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering. Filters 0-2 are vectorized; 3/4 carry a
    true sequential dependency along the row and fall back to a pixel loop."""
    rows = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = rows[y, 0]
        line = rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: per-lane cumulative sum (uint8 wraps)
            lanes = line.reshape(-1, bpp)
            out[y] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Supports bit depth 8, interlace 0, color types 0/2/3/4/6.
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise ValueError(f"unsupported PNG color type {color_type}")
    channels = _CHANNELS_BY_COLOR_TYPE[color_type]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    pixels = _unfilter(raw, height, stride, channels).reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        pixels = palette[pixels[:, :, 0]]
    return pixels


def png_encode(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines, 6)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# WAV (integer PCM)
# ---------------------------------------------------------------------------

_WAV_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}
_WAV_SCALE = {1: 128.0, 2: 32768.0, 4: 2147483648.0}


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32 PCM in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        sw = f.getsampwidth()
        if sw not in _WAV_DTYPE:
            raise ValueError(f"unsupported WAV sample width {sw}")
        nch = f.getnchannels()
        sr = f.getframerate()
        frames = f.readframes(f.getnframes())
    pcm = np.frombuffer(frames, dtype=_WAV_DTYPE[sw]).astype(np.float32)
    if sw == 1:  # 8-bit WAV is unsigned, midpoint 128
        pcm -= 128.0
    pcm /= _WAV_SCALE[sw]
    if nch > 1:
        pcm = pcm[: (len(pcm) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return pcm, sr


def wav_encode(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono float PCM in [-1, 1] -> 16-bit WAV bytes (fixtures/tests)."""
    samples = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    ints = np.round(samples * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(ints.tobytes())
    return buf.getvalue()


def downsample_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, c) so max(h, w) == max_side (no-op
    when already smaller). Index sampling — no interpolation kernels."""
    h, w = arr.shape[:2]
    scale = max(h, w) / float(max_side)
    if scale <= 1.0:
        return arr
    nh, nw = max(1, int(round(h / scale))), max(1, int(round(w / scale)))
    ys = np.minimum((np.arange(nh) * (h / nh)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(nw) * (w / nw)).astype(np.int64), w - 1)
    return arr[ys][:, xs]
