"""Multimodal column stages: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

Decode kernels, in priority order per payload:
- **PNG** and **WAV** decode NATIVELY via ``functions/codecs.py`` (stdlib
  zlib/struct/wave + numpy) and **baseline JPEG** via ``functions/jpeg.py``
  (numpy DCT + table-driven Huffman — no third-party codec needed);
  round-trip correctness is pinned in tests/test_codecs.py.
- other image/audio formats go through PIL / soundfile when installed
  (absent in this sandbox — gated behind try-imports);
- otherwise ``allow_fake=True`` substitutes a deterministic fake (seeded by
  the payload digest) so the Ray-side plumbing — schema, batch shapes, actor
  lifecycle, output layout — stays exercised, and ``allow_fake=False`` turns
  the row into a captured ``decode_ok=False`` failure (batch survives).
- **video**: MJPEG AVI parses NATIVELY (``functions/avi.py`` RIFF walker +
  the baseline JPEG decoder); other containers fall to the gated fake.
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions import jpeg

try:  # pragma: no cover - not installed here
    from PIL import Image  # type: ignore
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

IMAGE_META_TYPE = pa.struct([("width", pa.int32()), ("height", pa.int32()),
                             ("channels", pa.int32()), ("format", pa.string())])
IMAGE_FEATURES_TYPE = pa.list_(pa.float32())


def _drop_status(batch: pa.Table) -> pa.Table:
    """Each media stage REPLACES the per-row decode status: chaining two
    stages over a multi-media table must not produce duplicate
    decode_ok/decode_error columns (an exact duplicate name breaks
    column(), select_columns and parquet writes). Per-stage results live
    on in the namespaced meta/feature columns."""
    drop = [c for c in ("decode_ok", "decode_error")
            if c in batch.column_names]
    return batch.drop_columns(drop) if drop else batch


def _fake_decode(payload: bytes, max_side: int = 64) -> np.ndarray:
    """Deterministic stand-in decode: dimensions and pixels derived from the
    payload digest. Replaces PIL.Image.open in this sandbox."""
    digest = hashlib.sha256(payload).digest()
    w = 16 + digest[0] % max_side
    h = 16 + digest[1] % max_side
    rng = np.random.RandomState(int.from_bytes(digest[2:6], "little"))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class ImageDecodeStage:
    """Actor stage: binary image column -> metadata + mean-channel features.

    PNG and baseline JPEG payloads decode natively (functions/codecs.py,
    functions/jpeg.py); other formats need PIL; ``allow_fake=True``
    substitutes the deterministic fake for them, else the row fails
    captured (decode_ok=False) and the batch survives.
    ``resize_to`` bounds the longest side (nearest-neighbor downsample) —
    features are computed on the resized pixels.
    """

    def __init__(self, image_col: str = "image", resize_to: Optional[int] = None,
                 allow_fake: bool = False):
        self.image_col = image_col
        self.resize_to = resize_to
        self.allow_fake = allow_fake

    @staticmethod
    def _to_rgb(arr: np.ndarray) -> tuple[np.ndarray, int]:
        """(3-channel RGB view, NATIVE channel count). Features are always
        fixed-width 3 so consumers can stack them across a mixed-format
        corpus; the meta column keeps the file's true channel count.
        Gray / gray+alpha replicate luma; RGBA drops alpha."""
        if arr.ndim == 2:
            return np.stack([arr] * 3, axis=-1), 1
        native = arr.shape[2]
        if native == 1:
            return np.repeat(arr, 3, axis=2), 1
        if native == 2:  # grayscale + alpha
            return np.repeat(arr[:, :, :1], 3, axis=2), 2
        if native == 4:
            return arr[:, :, :3], 4
        return arr, native

    def _decode(self, payload: bytes) -> tuple[np.ndarray, str, int]:
        if codecs.is_png(payload):
            arr, native = self._to_rgb(codecs.png_decode(payload))
            if self.resize_to:
                arr = codecs.downsample_nearest(arr, self.resize_to)
            return arr, "png", native
        if jpeg.is_jpeg(payload):
            arr, native = self._to_rgb(jpeg.jpeg_decode(payload))
            if self.resize_to:
                arr = codecs.downsample_nearest(arr, self.resize_to)
            return arr, "jpeg", native
        if _HAVE_PIL:  # pragma: no cover - library absent in this env
            import io
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            if self.resize_to:
                img = img.resize((self.resize_to, self.resize_to))
            return np.asarray(img), "rgb8", 3
        if self.allow_fake:
            return _fake_decode(payload), "fake-rgb8", 3
        raise ValueError(
            "payload is not PNG/JPEG and no other image codec is installed; "
            "pass "
            "allow_fake=True for the deterministic stand-in")

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, oks, errs = [], [], [], []
        for payload in batch.column(self.image_col).to_pylist():
            # compute the whole row BEFORE appending: a mid-row exception
            # must not leave half-appended parallel lists (the except path
            # would append again and misalign the batch)
            try:
                arr, fmt, native = self._decode(payload or b"")
                meta = {"width": arr.shape[1], "height": arr.shape[0],
                        "channels": native, "format": fmt}
                feat = arr.reshape(-1, arr.shape[2]).mean(axis=0) \
                    .astype(np.float32).tolist()
                row = (meta, feat, True, None)
            except Exception as exc:
                row = (None, None, False, f"{type(exc).__name__}: {exc}")
            metas.append(row[0])
            feats.append(row[1])
            oks.append(row[2])
            errs.append(row[3])
        batch = batch.drop_columns([self.image_col])  # wide payload ends here
        batch = _drop_status(batch)
        batch = batch.append_column("image_meta", pa.array(metas, IMAGE_META_TYPE))
        batch = batch.append_column("image_features",
                                    pa.array(feats, IMAGE_FEATURES_TYPE))
        batch = batch.append_column("decode_ok", pa.array(oks, pa.bool_()))
        return batch.append_column("decode_error", pa.array(errs, pa.string()))


AUDIO_META_TYPE = pa.struct([("sample_rate", pa.int32()),
                             ("n_samples", pa.int64()),
                             ("duration_s", pa.float32())])


class AudioFeatureStage:
    """Audio decode + feature extraction: binary "audio" -> metadata +
    fixed-width band-energy features. WAV (integer PCM) decodes natively via
    the stdlib codec; other containers would need soundfile (absent here) —
    ``allow_fake=True`` substitutes the deterministic fake for them, else
    the row fails captured (decode_ok=False)."""

    def __init__(self, audio_col: str = "audio", n_bands: int = 8,
                 allow_fake: bool = False):
        self.audio_col = audio_col
        self.n_bands = n_bands
        self.allow_fake = allow_fake

    def _decode(self, payload: bytes) -> tuple[np.ndarray, int]:
        if codecs.is_wav(payload):
            return codecs.wav_decode(payload)
        if self.allow_fake:
            digest = hashlib.sha256(payload).digest()
            rng = np.random.RandomState(int.from_bytes(digest[:4], "little"))
            n = 1600 + int.from_bytes(digest[4:6], "little") % 14400
            return rng.standard_normal(n).astype(np.float32), 16000
        raise ValueError(
            "payload is not WAV and no other audio codec is installed; pass "
            "allow_fake=True for the deterministic stand-in")

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, oks, errs = [], [], [], []
        for payload in batch.column(self.audio_col).to_pylist():
            # row computed fully before the appends (append-atomicity, see
            # ImageDecodeStage)
            try:
                pcm, sr = self._decode(payload or b"")
                spec = np.abs(np.fft.rfft(pcm))
                if len(spec) < self.n_bands:
                    # np.array_split would yield EMPTY bands whose mean is
                    # silently NaN with decode_ok=True — too-short clips
                    # are a captured failure instead
                    raise ValueError(
                        f"clip too short: {len(spec)} spectrum bins < "
                        f"{self.n_bands} bands")
                bands = np.array_split(spec, self.n_bands)
                meta = {"sample_rate": sr, "n_samples": len(pcm),
                        "duration_s": len(pcm) / sr}
                row = (meta, [float(np.mean(b)) for b in bands], True, None)
            except Exception as exc:
                row = (None, None, False, f"{type(exc).__name__}: {exc}")
            metas.append(row[0])
            feats.append(row[1])
            oks.append(row[2])
            errs.append(row[3])
        batch = batch.drop_columns([self.audio_col])
        batch = _drop_status(batch)
        batch = batch.append_column("audio_meta", pa.array(metas, AUDIO_META_TYPE))
        batch = batch.append_column("audio_features",
                                    pa.array(feats, pa.list_(pa.float64())))
        batch = batch.append_column("decode_ok", pa.array(oks, pa.bool_()))
        return batch.append_column("decode_error", pa.array(errs, pa.string()))


class FrameSampleStage:
    """Video-frame sampling: binary "video" -> every k-th decoded frame
    (1→N fan-out: one row in, n frame rows out). MJPEG AVI payloads decode
    NATIVELY (functions/avi.py container walk + functions/jpeg.py baseline
    decode); the digest and mean-luma outputs are computed from the DECODED
    pixels, so they pin the whole codec path. Other containers use the
    gated deterministic fake (``allow_fake=True``) or raise per payload."""

    def __init__(self, video_col: str = "video", every_k: int = 2,
                 max_frames: int = 8, allow_fake: bool = True):
        self.video_col = video_col
        self.every_k = every_k
        self.max_frames = max_frames
        self.allow_fake = allow_fake

    def _sample(self, payload: bytes):
        """(frame_no, decoded RGB array) for every k-th container frame."""
        from ..functions import avi
        if avi.is_avi(payload):
            frames = avi.avi_frames(payload)
            picked = list(range(0, len(frames), self.every_k))[:self.max_frames]
            return [(f, jpeg.jpeg_decode(frames[f])) for f in picked]
        if not self.allow_fake:
            raise ValueError("payload is not an MJPEG AVI and no other video "
                             "codec is installed; pass allow_fake=True for "
                             "the deterministic stand-in")
        n_frames = min(self.max_frames, 1 + len(payload) % self.max_frames)
        return [(f * self.every_k,
                 _fake_decode(payload + f.to_bytes(4, "little"), 16))
                for f in range(n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_nos, digests, lumas, oks, errs = [], [], [], [], [], []
        # id fallback must never pick the video payload itself (a binary
        # column replicated per frame row is a silent memory blowup)
        non_payload = [c for c in batch.column_names if c != self.video_col]
        if "url" in batch.column_names:
            id_col = "url"
        elif non_payload:
            id_col = non_payload[0]
        else:
            batch = batch.append_column(
                "row_id", pa.array(np.arange(len(batch)), pa.int64()))
            id_col = "row_id"
        for rid, payload in zip(batch.column(id_col).to_pylist(),
                                batch.column(self.video_col).to_pylist()):
            try:
                sampled = self._sample(payload or b"")
            except Exception as exc:
                ids.append(rid)
                frame_nos.append(-1)
                digests.append(None)
                lumas.append(None)
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}")
                continue
            for f, arr in sampled:
                rgb = arr if arr.ndim == 3 else np.repeat(
                    arr[:, :, None], 3, axis=2)
                ids.append(rid)
                frame_nos.append(f)
                digests.append(hashlib.sha256(
                    rgb.tobytes()).hexdigest()[:16])
                # integer-exact mean luma (scaled sum // count): stable
                # across platforms, unlike float means
                lumas.append(int(rgb.astype(np.int64).sum()
                                 // (rgb.size or 1)))
                oks.append(True)
                errs.append(None)
        return pa.Table.from_pydict({
            id_col: pa.array(ids),
            "frame_no": pa.array(frame_nos, pa.int32()),
            "frame_digest": pa.array(digests, pa.string()),
            "mean_luma": pa.array(lumas, pa.int64()),
            "decode_ok": pa.array(oks, pa.bool_()),
            "decode_error": pa.array(errs, pa.string())})


def decode_images(ds: "Any", *, image_col: str = "image",
                  allow_fake: bool = False, batch_size: int = 32,
                  concurrency: Any = (1, 4)) -> "Any":
    """Small batches: batch x payload must fit the worker heap (large binary
    payloads are exactly the SURVEY §7.5 wide-row case)."""
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs={"image_col": image_col,
                                                 "allow_fake": allow_fake},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
