"""Multimodal (image/audio/video) operators — real Ray plumbing, stubbed
codecs.

Media ride as opaque ``binary`` columns with typed metadata (SURVEY.md
"multimodal columns"). Decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages: codec state initialized once per actor in
``__init__``. The actual image/audio libraries are NOT in this container, so
``DECODERS_AVAILABLE`` gates them: with libraries absent the stages either
raise ``NotImplementedError`` (strict mode) or produce a deterministic fake
decode (hash-seeded pseudo-pixels with the declared shape) so the schema,
batch sizing, actor signatures and output layout are real and tested.

Batch-size note (scale design): binary payloads are large — callers should
pass a small ``batch_size`` (e.g. 16–64) and let ``DataContext.
target_max_block_size`` govern block splitting, rather than defaulting to
row-count-based batches sized for scalar columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_bytes_rows, splitmix64

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    DECODERS_AVAILABLE = True
except ImportError:
    DECODERS_AVAILABLE = False


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


class ImageDecodeStage:
    """binary image column → fixed-size decoded tensor + dims.

    Output schema: + width:int32, height:int32, channels:int32,
    pixels:fixed_size_list<uint8, H*W*C> (resized to ``target`` — the resize
    IS the decode step here, mirroring a decode+resize fused stage).
    """

    def __init__(self, target: tuple[int, int] = (32, 32), channels: int = 3,
                 seed: int = 42, strict: bool = False,
                 payload_col: str = "payload"):
        self.h, self.w = target
        self.c = channels
        self.seed = seed
        self.strict = strict
        self.payload_col = payload_col
        if strict and not DECODERS_AVAILABLE:
            raise NotImplementedError(
                "image codecs (PIL) not available in this environment; "
                "run with strict=False for the deterministic stub decode"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _binary_rows(batch[self.payload_col])
        n = len(payloads)
        pix = np.empty((n, self.h * self.w * self.c), dtype=np.uint8)
        for i, p in enumerate(payloads):
            if DECODERS_AVAILABLE:  # pragma: no cover
                raise NotImplementedError("real decode path requires PIL")
            pix[i] = _fake_pixels(p or b"", self.h, self.w, self.c, self.seed).reshape(-1)
        flat = pa.array(pix.reshape(-1), pa.uint8())
        tensor = pa.FixedSizeListArray.from_arrays(flat, self.h * self.w * self.c)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("height", pa.array([self.h] * n, pa.int32()))
        out = out.append_column("width", pa.array([self.w] * n, pa.int32()))
        out = out.append_column("channels", pa.array([self.c] * n, pa.int32()))
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

    Stub decode: payload bytes chunked into ``n_frames`` windows, per-window
    mean/std over the raw bytes (a real decoder would emit PCM frames)."""

    def __init__(self, n_frames: int = 8, strict: bool = False,
                 payload_col: str = "payload"):
        self.n_frames = n_frames
        self.payload_col = payload_col
        if strict and not DECODERS_AVAILABLE:
            raise NotImplementedError("audio codecs not available")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _binary_rows(batch[self.payload_col])
        n = len(payloads)
        out = np.zeros((n, self.n_frames * 2), dtype=np.float32)
        for i, p in enumerate(payloads):
            if not p:
                continue
            arr = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
            chunks = np.array_split(arr, self.n_frames)
            out[i, 0::2] = [ch.mean() if len(ch) else 0.0 for ch in chunks]
            out[i, 1::2] = [ch.std() if len(ch) else 0.0 for ch in chunks]
        flat = pa.array(out.reshape(-1), pa.float32())
        frames = pa.FixedSizeListArray.from_arrays(flat, self.n_frames * 2)
        return batch.drop_columns([self.payload_col]).append_column("frames", frames)


def decode_images(media_ds, *, target=(32, 32), channels=3, batch_size: int = 32,
                  concurrency: int = 4, seed: int = 42):
    """Actor-pool decode pipeline over a media Dataset (id, payload, ...)."""
    return media_ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"target": target, "channels": channels, "seed": seed},
    )
