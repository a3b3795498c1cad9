"""Pure-stdlib PNG/WAV codec correctness: lossless round-trips for every
supported color type, all five PNG scanline filters, palette images, WAV
sample widths and channel mixdown, and the nearest-neighbor resize."""

import struct
import zlib

import numpy as np
import pytest

from pdfextraction_ray.functions import codecs as C


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    rng = np.random.RandomState(channels)
    img = rng.randint(0, 256, size=(23, 17, channels), dtype=np.uint8)
    data = C.png_encode(img)
    assert C.is_png(data)
    out = C.png_decode(data)
    assert np.array_equal(out, img)


def test_png_roundtrip_2d_grey():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = C.png_decode(C.png_encode(img))
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], img)


def _encode_with_filters(img: np.ndarray, ftypes) -> bytes:
    """Reference encoder applying a chosen filter per scanline (the inverse
    of the decoder's unfilter math, computed in int space)."""
    h, w, c = img.shape
    rows = []
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        f = ftypes[y % len(ftypes)]
        left = np.concatenate([np.zeros(c, np.int64), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int64), prev[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, upleft))
            enc = cur - pred
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (C.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_every_scanline_filter(ftypes):
    rng = np.random.RandomState(sum(ftypes) + 11)
    img = rng.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    out = C.png_decode(_encode_with_filters(img, ftypes))
    assert np.array_equal(out, img), ftypes


def test_png_palette_decode():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                       dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    h, w = idx.shape

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    data = (C.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    out = C.png_decode(data)
    assert np.array_equal(out, palette[idx])


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        C.png_decode(b"not a png at all")
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(C.png_encode(img))
    data[24] = 16  # bit depth byte inside IHDR
    # CRC is not re-checked; depth gate must trip first
    with pytest.raises(ValueError, match="bit depth"):
        C.png_decode(bytes(data))


def test_wav_roundtrip_mono16():
    sr = 16000
    t = np.arange(sr // 4) / sr
    pcm = 0.25 * np.sin(2 * np.pi * 220 * t)
    out, got_sr = C.wav_decode(C.wav_encode(pcm, sr))
    assert got_sr == sr
    assert out.dtype == np.float32
    assert np.max(np.abs(out - pcm)) < 1e-4  # 16-bit quantization bound


def test_wav_stereo_mixdown_and_widths():
    import io
    import wave
    sr = 8000
    left = np.full(100, 0.5)
    right = np.full(100, -0.5)
    inter = np.empty(200)
    inter[0::2], inter[1::2] = left, right
    ints = np.round(np.clip(inter, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(ints.tobytes())
    out, got_sr = C.wav_decode(buf.getvalue())
    assert got_sr == sr and len(out) == 100
    assert np.max(np.abs(out)) < 1e-4  # L and R cancel in the mono mixdown
    assert not C.is_wav(b"RIFFxxxxJUNK")
    assert C.is_wav(buf.getvalue())


def test_downsample_nearest():
    img = np.arange(64 * 48 * 3, dtype=np.uint8).reshape(64, 48, 3)
    out = C.downsample_nearest(img, 16)
    assert out.shape == (16, 12, 3)
    assert np.array_equal(C.downsample_nearest(img, 100), img)  # no upscale


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py)
# ---------------------------------------------------------------------------

def _gradient(h, w):
    import numpy as np
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    return np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_444_close():
    import numpy as np

    from pdfextraction_ray.functions import jpeg as J
    img = _gradient(48, 64)
    enc = J.jpeg_encode(img, quality=90)
    assert J.is_jpeg(enc)
    dec = J.jpeg_decode(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_jpeg_roundtrip_420_subsampled():
    import numpy as np

    from pdfextraction_ray.functions import jpeg as J
    img = _gradient(50, 70)  # non-multiples of 16: pad + crop path
    dec = J.jpeg_decode(J.jpeg_encode(img, quality=90, subsampling="420"))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


def test_jpeg_grayscale_and_determinism():
    import numpy as np

    from pdfextraction_ray.functions import jpeg as J
    g = _gradient(40, 40)[..., 0]
    enc = J.jpeg_encode(g, quality=85)
    assert enc == J.jpeg_encode(g, quality=85)
    dec = J.jpeg_decode(enc)
    assert dec.ndim == 2 and np.abs(dec.astype(int) - g.astype(int)).max() <= 6


def test_jpeg_noise_nonmultiple_dims_roundtrips():
    import numpy as np

    from pdfextraction_ray.functions import jpeg as J
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(img, quality=95))
    assert dec.shape == img.shape  # noise: only shape/decode-success pinned


def test_jpeg_rejects_progressive():
    import pytest

    from pdfextraction_ray.functions import jpeg as J
    # minimal stream: SOI + SOF2 header
    fake = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="progressive"):
        J.jpeg_decode(fake)


def test_jpeg_decodes_real_world_baseline_file():
    """Decoder is table-driven from the stream: a third-party baseline JPEG
    (standard Annex-K Huffman tables + restart markers) must decode."""
    import os

    import pytest

    from pdfextraction_ray.functions import jpeg as J
    path = ("/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/"
            "doc/rust/html/embedded-book/assets/verify.jpeg")
    if not os.path.exists(path):
        pytest.skip("no third-party JPEG available in this environment")
    arr = J.jpeg_decode(open(path, "rb").read())
    assert arr.shape == (477, 720, 3)
    assert 20 < arr.mean() < 240  # plausible photo content, not garbage


def test_image_stage_decodes_jpeg_natively():
    import numpy as np
    import pyarrow as pa

    from pdfextraction_ray.functions import jpeg as J
    from pdfextraction_ray.stages.multimodal import ImageDecodeStage
    img = _gradient(24, 24)
    t = pa.Table.from_pydict({"url": ["u"], "image": [J.jpeg_encode(img)]})
    out = ImageDecodeStage(allow_fake=False)(t)
    assert out.column("decode_ok").to_pylist() == [True]
    meta = out.column("image_meta").to_pylist()[0]
    assert (meta["format"], meta["width"], meta["height"]) == ("jpeg", 24, 24)
    feats = np.array(out.column("image_features").to_pylist()[0])
    assert np.abs(feats - img.reshape(-1, 3).mean(0)).max() < 4.0


def test_avi_parser_fails_closed_on_malformed_input():
    """Truncated / corrupted AVI payloads raise ValueError (or decode
    fewer frames) — never hang, loop, or crash the stage."""
    import numpy as np
    import pytest

    from pdfextraction_ray.functions.avi import avi_encode, avi_frames, is_avi

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
              for _ in range(3)]
    good = avi_encode(frames)
    assert len(avi_frames(good)) == 3

    for bad in (b"", b"RIFF", good[:11], b"RIFF\x00\x00\x00\x00AVI "):
        with pytest.raises(ValueError):
            avi_frames(bad)
    # size field lies beyond the buffer: parser clamps, never reads past
    for cut in (20, len(good) // 2, len(good) - 3):
        try:
            got = avi_frames(good[:cut])
            assert len(got) <= 3
        except ValueError:
            pass
    # flipped bytes inside movi: either fewer/garbled frames or ValueError,
    # but structurally bounded
    corrupt = bytearray(good)
    for pos in range(60, min(len(corrupt), 400), 17):
        corrupt[pos] ^= 0xFF
    try:
        avi_frames(bytes(corrupt))
    except ValueError:
        pass


def test_jpeg_decode_tolerates_ff_fill_bytes():
    """ADVICE r3 (low): ITU T.81 B.1.1.2 allows 0xFF fill bytes before any
    marker; the decoder must skip them instead of misreading the length."""
    import numpy as np

    from pdfextraction_ray.functions import jpeg as J

    rng = np.random.default_rng(5)
    img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    enc = J.jpeg_encode(img, quality=90)
    # insert fill bytes before the first post-SOI marker (enc[2:4])
    assert enc[2] == 0xFF
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    a = J.jpeg_decode(enc)
    b = J.jpeg_decode(padded)
    assert np.array_equal(a, b)
