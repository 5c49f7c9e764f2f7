"""Multimodal (image/audio/video) operators — actor-pool decode stages with
REAL built-in codecs for uncompressed formats.

Media ride as opaque ``binary`` columns with typed metadata (SURVEY.md
"multimodal columns"). Decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages: codec state initialized once per actor in
``__init__``. Coverage is tiered:

- **Built-in, always available** (`functions/codecs.py`, pure numpy /
  stdlib): BMP (24-bit uncompressed) and PPM (P6) images, RIFF/WAVE PCM-16
  audio, YUV4MPEG2 (y4m) video — decoded for real, exact round-trip
  tested, then resized/frame-sampled with deterministic kernels.
- **PIL extension** (guarded import, absent in this container): extends
  image coverage to JPEG/PNG. ``PIL_AVAILABLE`` gates it.
- **Unrecognised payloads**: with ``strict=True`` the stage raises; with
  ``strict=False`` (default) it emits a deterministic hash-seeded stub
  decode with the declared shape and records ``codec="stub"`` so fallbacks
  are observable, never silent.

Batch-size note (scale design): binary payloads are large — callers should
pass a small ``batch_size`` (e.g. 16–64) and let ``DataContext.
target_max_block_size`` govern block splitting, rather than defaulting to
row-count-based batches sized for scalar columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.hashing import hash_bytes_rows, splitmix64

try:  # pragma: no cover - PIL not present in this container
    from PIL import Image  # noqa: F401

    PIL_AVAILABLE = True
except ImportError:
    PIL_AVAILABLE = False

# Back-compat alias: built-in codecs mean decoders are always available;
# PIL only widens the format set.
DECODERS_AVAILABLE = True


def _binary_rows(col) -> list[bytes]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_pylist()


def _fake_pixels(payload: bytes, h: int, w: int, c: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-decode: pixels seeded from the payload hash —
    stable across processes/retries, shaped like a real decode."""
    data = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
    base = hash_bytes_rows(data, np.array([0, len(data)], np.int64), seed)[0]
    n = h * w * c
    idx = np.arange(n, dtype=np.uint64)
    vals = splitmix64(idx + base)
    return (vals & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, c)


def decode_image_payload(payload: bytes) -> tuple[np.ndarray, str] | None:
    """Decode one image payload with the built-in codecs (PIL if present).
    Returns (H×W×3 uint8 RGB, codec name), or None if undecodable."""
    fmt = codecs.sniff(payload or b"")
    if fmt == "bmp":
        return codecs.decode_bmp(payload), fmt
    if fmt == "ppm":
        return codecs.decode_ppm(payload), fmt
    if fmt in ("jpeg", "png") and PIL_AVAILABLE:  # pragma: no cover
        import io

        img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        return img, fmt
    return None


class ImageDecodeStage:
    """binary image column → fixed-size decoded tensor + dims + codec.

    Output schema: + width:int32, height:int32, channels:int32,
    codec:string, pixels:fixed_size_list<uint8, H*W*C> (decode fused with a
    nearest-neighbour resize to ``target``). BMP/PPM payloads decode for
    real; unrecognised payloads raise (strict) or fall back to the
    deterministic stub with ``codec="stub"``.
    """

    def __init__(self, target: tuple[int, int] = (32, 32), channels: int = 3,
                 seed: int = 42, strict: bool = False,
                 payload_col: str = "payload"):
        self.h, self.w = target
        self.c = channels
        self.seed = seed
        self.strict = strict
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _binary_rows(batch[self.payload_col])
        n = len(payloads)
        pix = np.empty((n, self.h * self.w * self.c), dtype=np.uint8)
        fmts: list[str] = []
        for i, p in enumerate(payloads):
            try:
                decoded = decode_image_payload(p)
            except Exception:
                # sniffed as an image but the payload is corrupt/truncated
                if self.strict:
                    raise
                decoded = None
            if decoded is not None:
                img, fmt = decoded
                img = codecs.resize_nearest(img, self.h, self.w)
                if self.c == 1:
                    img = img.mean(axis=2, keepdims=True).astype(np.uint8)
                pix[i] = img.reshape(-1)
                fmts.append(fmt)
            elif self.strict:
                raise NotImplementedError(
                    f"undecodable image payload (sniffed "
                    f"{codecs.sniff(p or b'')!r}; PIL available: {PIL_AVAILABLE})")
            else:
                pix[i] = _fake_pixels(p or b"", self.h, self.w, self.c,
                                      self.seed).reshape(-1)
                fmts.append("stub")
        flat = pa.array(pix.reshape(-1), pa.uint8())
        tensor = pa.FixedSizeListArray.from_arrays(flat, self.h * self.w * self.c)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("height", pa.array([self.h] * n, pa.int32()))
        out = out.append_column("width", pa.array([self.w] * n, pa.int32()))
        out = out.append_column("channels", pa.array([self.c] * n, pa.int32()))
        out = out.append_column("codec", pa.array(fmts, pa.string()))
        return out.append_column("pixels", tensor)


class ImageFeatureStage:
    """decoded pixels → small float feature vector (channel means/stds +
    coarse grid means) — the embed step of an image dedup pipeline."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"][0].as_py()
        w = batch["width"][0].as_py()
        c = batch["channels"][0].as_py()
        col = batch["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.values, dtype=np.uint8).reshape(len(batch), h, w, c)
        g = self.grid
        feats = [mat.mean(axis=(1, 2)), mat.std(axis=(1, 2))]
        gh, gw = h // g, w // g
        grid_means = mat[:, : gh * g, : gw * g, :] \
            .reshape(len(batch), g, gh, g, gw, c).mean(axis=(2, 4)) \
            .reshape(len(batch), -1)
        feats.append(grid_means)
        F = np.concatenate(feats, axis=1).astype(np.float32)
        flat = pa.array(F.reshape(-1), pa.float32())
        emb = pa.FixedSizeListArray.from_arrays(flat, F.shape[1])
        return batch.drop_columns(["pixels"]).append_column("embedding", emb)


class AudioFrameSampleStage:
    """binary audio column → fixed number of frame-level summaries.

    RIFF/WAVE PCM-16 payloads decode for real (stdlib ``wave``): samples are
    mono-mixed, normalised to [-1, 1] float, split into ``n_frames``
    windows, and summarised as per-window mean/std (``codec="wav"``).
    Unrecognised payloads raise (strict) or fall back to the same summary
    over raw bytes (``codec="stub"``)."""

    def __init__(self, n_frames: int = 8, strict: bool = False,
                 payload_col: str = "payload"):
        self.n_frames = n_frames
        self.strict = strict
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _binary_rows(batch[self.payload_col])
        n = len(payloads)
        out = np.zeros((n, self.n_frames * 2), dtype=np.float32)
        fmts: list[str] = []
        rates = np.zeros(n, dtype=np.int32)
        for i, p in enumerate(payloads):
            samples = None
            if p and codecs.sniff(p) == "wav":
                try:
                    samples, rate = codecs.decode_wav_pcm16(p)
                except Exception:
                    if self.strict:
                        raise
            if samples is not None:
                arr = samples.astype(np.float32).mean(axis=1) / 32768.0
                fmts.append("wav")
                rates[i] = rate
            elif self.strict:
                raise NotImplementedError(
                    f"undecodable audio payload (sniffed {codecs.sniff(p or b'')!r})")
            else:
                arr = (np.frombuffer(p, dtype=np.uint8).astype(np.float32)
                       if p else np.zeros(0, np.float32))
                fmts.append("stub")
            chunks = np.array_split(arr, self.n_frames)
            out[i, 0::2] = [ch.mean() if len(ch) else 0.0 for ch in chunks]
            out[i, 1::2] = [ch.std() if len(ch) else 0.0 for ch in chunks]
        flat = pa.array(out.reshape(-1), pa.float32())
        frames = pa.FixedSizeListArray.from_arrays(flat, self.n_frames * 2)
        res = batch.drop_columns([self.payload_col])
        res = res.append_column("codec", pa.array(fmts, pa.string()))
        res = res.append_column("sample_rate", pa.array(rates, pa.int32()))
        return res.append_column("frames", frames)


class VideoFrameSampleStage:
    """binary video column → evenly-sampled frame thumbnails.

    YUV4MPEG2 (y4m) payloads decode for real (`functions/codecs.py`):
    ``n_frames`` frames sampled at evenly-spaced indices, each resized to
    ``thumb`` with the nearest-neighbour kernel, emitted as one
    fixed-size float32 tensor (pixels / 255) usable as a video
    fingerprint — plus ``n_total_frames`` and ``fps``. Unrecognised
    payloads raise (strict) or emit a deterministic hash-seeded stub
    (``codec="stub"``, ``n_total_frames=0``)."""

    def __init__(self, n_frames: int = 4, thumb: tuple[int, int] = (8, 8),
                 seed: int = 42, strict: bool = False,
                 payload_col: str = "payload"):
        self.n_frames = n_frames
        self.th, self.tw = thumb
        self.seed = seed
        self.strict = strict
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _binary_rows(batch[self.payload_col])
        n = len(payloads)
        dim = self.n_frames * self.th * self.tw * 3
        out = np.zeros((n, dim), dtype=np.float32)
        fmts: list[str] = []
        totals = np.zeros(n, dtype=np.int32)
        fps_num = np.zeros(n, dtype=np.int32)
        for i, p in enumerate(payloads):
            frames = None
            if p and codecs.sniff(p) == "y4m":
                try:
                    frames, fps = codecs.decode_y4m(p)
                except Exception:
                    if self.strict:
                        raise
            if frames is not None:
                idx = np.linspace(0, len(frames) - 1, self.n_frames).round() \
                    .astype(np.int64)
                thumbs = np.stack([codecs.resize_nearest(frames[j], self.th,
                                                         self.tw) for j in idx])
                out[i] = thumbs.reshape(-1).astype(np.float32) / 255.0
                fmts.append("y4m")
                totals[i] = len(frames)
                fps_num[i] = fps[0]
            elif self.strict:
                raise NotImplementedError(
                    f"undecodable video payload (sniffed {codecs.sniff(p or b'')!r})")
            else:
                fake = _fake_pixels(p or b"", self.n_frames,
                                    self.th * self.tw, 3, self.seed)
                out[i] = fake.reshape(-1).astype(np.float32) / 255.0
                fmts.append("stub")
        flat = pa.array(out.reshape(-1), pa.float32())
        frames_col = pa.FixedSizeListArray.from_arrays(flat, dim)
        res = batch.drop_columns([self.payload_col])
        res = res.append_column("codec", pa.array(fmts, pa.string()))
        res = res.append_column("n_total_frames", pa.array(totals, pa.int32()))
        res = res.append_column("fps_num", pa.array(fps_num, pa.int32()))
        return res.append_column("frames", frames_col)


def decode_images(media_ds, *, target=(32, 32), channels=3, batch_size: int = 32,
                  concurrency: int = 4, seed: int = 42, strict: bool = False):
    """Actor-pool decode pipeline over a media Dataset (id, payload, ...)."""
    return media_ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"target": target, "channels": channels,
                               "seed": seed, "strict": strict},
    )
