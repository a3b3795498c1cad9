"""Baseline JPEG codec in numpy + pure Python (no PIL) — VERDICT r2 #7.

Scope (documented, tested):
- ``jpeg_encode``: baseline sequential DCT, 8-bit, YCbCr 4:4:4 (or grayscale),
  Annex-K quantization tables scaled by ``quality`` (libjpeg formula), and
  SIMPLE VALID Huffman tables built programmatically (every DC symbol 4 bits,
  every AC symbol 8 bits — canonical, Kraft-valid, written into DHT; a real
  encoder's adaptive tables would compress better, but any spec-compliant
  decoder reads the tables from DHT, so interchange is unaffected).
- ``jpeg_decode``: baseline sequential (SOF0), 8-bit, 1- or 3-component,
  component sampling factors 1 or 2 (covers 4:4:4 / 4:2:2 / 4:2:0), restart
  markers, Huffman tables taken from the stream — so it decodes real-world
  baseline JPEGs, not just this encoder's output.
- NOT covered (raise ValueError): progressive (SOF2), arithmetic coding,
  12-bit precision, 4-component (CMYK).

The DCT/IDCT is the orthonormal 8x8 matrix form (F = A f A^T), vectorized
over all blocks of a component at once; the entropy coder is the per-symbol
Python loop inherent to Huffman bitstreams — fine for fixture-scale media,
and the honest baseline until a vectorized bitreader is warranted.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float64)


def _zigzag_order() -> np.ndarray:
    """(64,) flat indices into an 8x8 block, in zigzag scan order."""
    order = sorted(((x, y) for x in range(8) for y in range(8)),
                   key=lambda p: (p[0] + p[1],
                                  p[1] if (p[0] + p[1]) % 2 else p[0]))
    return np.array([x * 8 + y for x, y in order], dtype=np.int64)


ZIGZAG = _zigzag_order()          # block-flat index per zigzag position
UNZIGZAG = np.argsort(ZIGZAG)     # zigzag position per block-flat index


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# color transforms (JFIF YCbCr)
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), \
        rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# blockwise DCT helpers (vectorized over all blocks of a plane)
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad plane to multiples of 8 (edge replicate) and return
    (n_blocks, 8, 8) in raster block order plus block grid dims."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _from_blocks(blocks: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    plane = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return plane[:h, :w]


def _fdct_quant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    f = _A @ (blocks - 128.0) @ _A.T
    return np.round(f / q).astype(np.int32)


def _dequant_idct(coefs: np.ndarray, q: np.ndarray) -> np.ndarray:
    f = coefs.astype(np.float64) * q
    return _A.T @ f @ _A + 128.0


# ---------------------------------------------------------------------------
# Huffman tables — encoder side (simple valid canonical codes)
# ---------------------------------------------------------------------------

_DC_SYMBOLS = list(range(12))                      # size categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s        # EOB, ZRL, then (run,size)
                              for r in range(16) for s in range(1, 11)]


def _canonical_table(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """All symbols at one code length (Kraft: n <= 2^length, and the
    all-ones code is never reached since n < 2^length)."""
    assert len(symbols) < (1 << length)
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_ENC_DC = _canonical_table(_DC_SYMBOLS, 4)
_ENC_AC = _canonical_table(_AC_SYMBOLS, 8)


def _dht_segment(table_class: int, table_id: int, symbols: list[int],
                 length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([(table_class << 4) | table_id]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:  # pad to byte boundary with 1-bits (spec F.1.2.3)
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, additional bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(writer: _BitWriter, coefs: np.ndarray, pred: int) -> int:
    """Entropy-encode one component's blocks (raster order); returns the new
    DC predictor."""
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    for row in zz:
        dc = int(row[0])
        size, bits = _magnitude(dc - pred)
        code, length = _ENC_DC[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        pred = dc
        run = 0
        nz = np.nonzero(row[1:])[0]
        prev = 0
        for idx in nz:
            run = idx - prev
            prev = idx + 1
            while run > 15:
                c, ln = _ENC_AC[0xF0]           # ZRL
                writer.write(c, ln)
                run -= 16
            v = int(row[1 + idx])
            size, bits = _magnitude(v)
            c, ln = _ENC_AC[(run << 4) | size]
            writer.write(c, ln)
            writer.write(bits, size)
        if prev < 63:
            c, ln = _ENC_AC[0x00]               # EOB
            writer.write(c, ln)
    return pred


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 to baseline JPEG,
    interleaved single scan. ``subsampling``: '444' (one block per component
    per MCU) or '420' (2x2 luma blocks + 2x-downsampled chroma per MCU)."""
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    sub420 = subsampling == "420" and not gray
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("jpeg_encode expects (H,W,3) RGB or (H,W) gray")
        ycc = _rgb_to_ycbcr(arr)
        if sub420:
            h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
            ycc = np.pad(ycc, ((0, h16 - h), (0, w16 - w), (0, 0)),
                         mode="edge")
            # chroma: 2x2 box average
            cb = ycc[..., 1].reshape(h16 // 2, 2, w16 // 2, 2).mean((1, 3))
            cr = ycc[..., 2].reshape(h16 // 2, 2, w16 // 2, 2).mean((1, 3))
            planes = [ycc[..., 0], cb, cr]
        else:
            planes = [ycc[..., i] for i in range(3)]

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + ([qc, qc] if not gray else [])
    samplings = [0x22, 0x11, 0x11] if sub420 else [0x11] * 3

    out = bytearray(b"\xff\xd8")                                    # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"                     # APP0
    for tid, q in enumerate([ql] if gray else [ql, qc]):            # DQT
        body = bytes([tid]) + bytes(
            q.reshape(-1)[ZIGZAG].astype(np.uint8).tolist())
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)                      # SOF0
    for ci in range(ncomp):
        sof += bytes([ci + 1, samplings[ci], 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_SYMBOLS, 4)                       # DHT x2
    out += _dht_segment(1, 0, _AC_SYMBOLS, 8)
    sos = bytes([ncomp])                                            # SOS
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    all_coefs, grids = [], []
    for plane, q in zip(planes, quants):
        blocks, pbh, pbw = _to_blocks(plane)
        all_coefs.append(_fdct_quant(blocks, q))
        grids.append((pbh, pbw))
    writer = _BitWriter()
    preds = [0] * ncomp
    if sub420:
        ybh, ybw = grids[0]
        cbh, cbw = grids[1]
        for my in range(ybh // 2):       # MCU = 4 Y blocks + 1 Cb + 1 Cr
            for mx in range(ybw // 2):
                for dy in range(2):
                    for dx in range(2):
                        i = (2 * my + dy) * ybw + (2 * mx + dx)
                        preds[0] = _encode_blocks(
                            writer, all_coefs[0][i:i + 1], preds[0])
                for ci in (1, 2):
                    i = my * cbw + mx
                    preds[ci] = _encode_blocks(
                        writer, all_coefs[ci][i:i + 1], preds[ci])
    else:
        bh, bw = grids[0]
        for by in range(bh):             # interleaved MCU order (1x1 factors)
            for bx in range(bw):
                for ci in range(ncomp):
                    i = by * bw + bx
                    preds[ci] = _encode_blocks(writer, all_coefs[ci][i:i + 1],
                                               preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"                                              # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d, p = self.data, self.pos
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller via sync()
                raise _AtMarker(nxt)
            else:
                raise _AtMarker(nxt)
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, resetting bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2


class _AtMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG to (H, W, 3) RGB uint8 (grayscale is replicated
    to 3 channels by the caller if needed — returned as (H, W) here)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — skip them so the marker byte is never itself read as 0xFF
        # (which would shift the segment-length read to the wrong offset)
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.frombuffer(body[o + 1:o + 65], dtype=np.uint8)
                q = np.zeros(64)
                q[ZIGZAG] = flat
                quant[tid] = q.reshape(8, 8).astype(np.float64)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1:o + 17])
                n = sum(bits)
                values = body[o + 17:o + 17 + n]
                t = _build_huffman(bits, values)
                (huff_dc if cls == 0 else huff_ac)[tid] = t
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, sampling, qid = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": sampling >> 4,
                              "v": sampling & 0xF, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF marker 0x{marker:02X}"
                             " — progressive/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tids >> 4, tids & 0xF))
            break
        # APPn / COM / others: skipped via seglen
    return _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac,
                        restart_interval)


def _decode_scan(data: bytes, pos: int, frame: dict, scan: list,
                 quant: dict, huff_dc: dict, huff_ac: dict,
                 restart_interval: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in frame["comps"]):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient storage (block grid sized to MCU coverage)
    store = []
    for comp, _, _ in scan:
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        store.append(np.zeros((bh * bw, 8, 8), dtype=np.int32))
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(scan)
            mcu_count += 1
            for si, (comp, dc_id, ac_id) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_block(reader, huff_dc[dc_id],
                                            huff_ac[ac_id])
                        preds[si] += blk[0]
                        blk[0] = preds[si]
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        full = np.zeros(64, dtype=np.int32)
                        full[ZIGZAG] = blk
                        store[si][row * mcux * comp["h"] + col] = \
                            full.reshape(8, 8)
    planes = []
    for si, (comp, _, _) in enumerate(scan):
        q = quant[comp["q"]]
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        pix = _dequant_idct(store[si], q)
        plane = _from_blocks(pix, bh, bw, bh * 8, bw * 8)
        # upsample to full resolution by pixel replication
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def _decode_block(reader: _BitReader, dc_table: dict, ac_table: dict) -> np.ndarray:
    """One 8x8 block in zigzag order; blk[0] holds the DC DIFF (caller
    accumulates the predictor)."""
    blk = np.zeros(64, dtype=np.int32)
    size = _huff_decode(reader, dc_table)
    blk[0] = _extend(reader.read_bits(size), size) if size else 0
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_table)
        if sym == 0x00:      # EOB
            break
        if sym == 0xF0:      # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(reader.read_bits(size), size)
        k += 1
    return blk
