"""Built-in media codecs — pure numpy / stdlib, no external libraries.

Uncompressed formats are simple enough to decode without PIL/ffmpeg:

- **BMP** (Windows bitmap, 24-bit uncompressed ``BI_RGB``): 14-byte file
  header + 40-byte ``BITMAPINFOHEADER``, bottom-up BGR rows padded to
  4-byte boundaries.
- **PPM** (``P6`` binary): ASCII header (magic, width, height, maxval)
  followed by raw RGB bytes.
- **WAV** (RIFF PCM 16-bit): parsed with the stdlib ``wave`` module.

Encoders exist so fixtures and tests can synthesise real payloads
deterministically and assert exact decode round-trips. ``sniff`` routes a
payload to its decoder by magic bytes; compressed formats (JPEG/PNG/…)
are recognised as images but undecodable without PIL — callers fall back
to the stub or raise, per their strict mode.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, file size, res, res, pixel offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def sniff(payload: bytes) -> str | None:
    """Identify a payload by magic bytes. Returns 'bmp' | 'ppm' | 'wav' |
    'y4m' (built-in decodable), 'jpeg' | 'png' (image, needs PIL), or
    None."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


BUILTIN_IMAGE_FORMATS = frozenset({"bmp", "ppm"})
BUILTIN_AUDIO_FORMATS = frozenset({"wav"})
BUILTIN_VIDEO_FORMATS = frozenset({"y4m"})


# ---------------------------------------------------------------- images


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("BMP encoder expects 3-channel RGB")
    row_bytes = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    # bottom-up rows, BGR channel order
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + padded.nbytes, 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, padded.nbytes,
                          2835, 2835, 0, 0)
    return header + info + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB."""
    magic, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes,
                         offset=offset).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if bottom_up else img).copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary PPM (P6) bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM encoder expects 3-channel RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (H, W, 3) uint8 RGB. Handles comments and
    arbitrary whitespace in the header, per the PPM spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3).copy()


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize of an (H, W, C) array via index maps —
    pure numpy, deterministic (pixel-centre sampling)."""
    h, w = pixels.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[ys[:, None], xs[None, :]]


# ----------------------------------------------------------------- audio


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(N,) or (N, channels) int16 samples → RIFF/WAVE PCM bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ((N, channels) int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {f.getsampwidth()}")
        n, ch = f.getnframes(), f.getnchannels()
        raw = f.readframes(n)
        return (np.frombuffer(raw, dtype=np.int16).reshape(n, ch).copy(),
                f.getframerate())


# ----------------------------------------------------------------- video
#
# YUV4MPEG2 ("y4m") — the standard uncompressed video interchange format:
# ASCII stream header `YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<space>\n`, then
# per frame `FRAME\n` + raw planar YUV. Simple enough to codec in pure
# numpy. Supported colorspaces: C444 (no subsampling), C420/C420jpeg/
# C420mpeg2 (2×2-subsampled chroma, nearest upsample on decode), Cmono.
# RGB↔YUV uses full-range BT.601; gray frames (R=G=B) round-trip exactly.

_Y4M_MAGIC = b"YUV4MPEG2"


def _rgb_to_yuv(frames: np.ndarray) -> np.ndarray:
    f = frames.astype(np.float32)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    u = 128.0 + (f[..., 2] - y) * 0.492111
    v = 128.0 + (f[..., 0] - y) * 0.877283
    return np.clip(np.stack([y, u, v], axis=-1).round(), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    f = yuv.astype(np.float32)
    y, u, v = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + v / 0.877283
    b = y + u / 0.492111
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               colorspace: str = "C444") -> bytes:
    """(N, H, W, 3) uint8 RGB (or (N, H, W, 1) with Cmono) → y4m bytes."""
    n, h, w, c = frames.shape
    if colorspace == "Cmono":
        if c != 1:
            raise ValueError("Cmono expects single-channel frames")
        planes = [frames[..., 0]]
    elif colorspace == "C444":
        if c != 3:
            raise ValueError("C444 expects RGB frames")
        yuv = _rgb_to_yuv(frames)
        planes = [yuv[..., 0], yuv[..., 1], yuv[..., 2]]
    else:
        raise ValueError(f"unsupported encoder colorspace {colorspace}")
    out = [b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
           % (_Y4M_MAGIC, w, h, fps[0], fps[1], colorspace.encode())]
    for i in range(n):
        out.append(b"FRAME\n")
        out.extend(p[i].tobytes() for p in planes)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """y4m bytes → ((N, H, W, 3) uint8 RGB frames, (fps_num, fps_den)).
    Cmono luma is replicated across the 3 output channels."""
    nl = payload.index(b"\n")
    fields = payload[:nl].split(b" ")
    if fields[0] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    fps = (25, 1)
    cs = "C420"
    for f in fields[1:]:
        if f[:1] == b"W":
            w = int(f[1:])
        elif f[:1] == b"H":
            h = int(f[1:])
        elif f[:1] == b"F":
            num, den = f[1:].split(b":")
            fps = (int(num), int(den))
        elif f[:1] == b"C":
            cs = f.decode()
    if not (w and h):
        raise ValueError("y4m header missing W/H")
    if cs.startswith("C420"):
        ch, cw = (h + 1) // 2, (w + 1) // 2
    elif cs == "C444":
        ch, cw = h, w
    elif cs == "Cmono":
        ch = cw = 0
    else:
        raise ValueError(f"unsupported y4m colorspace {cs}")
    frame_bytes = h * w + 2 * ch * cw
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m frame header")
        pos = fl + 1
        raw = np.frombuffer(payload, np.uint8, count=frame_bytes, offset=pos)
        pos += frame_bytes
        y = raw[: h * w].reshape(h, w)
        if cs == "Cmono":
            frames.append(np.repeat(y[..., None], 3, axis=-1))
            continue
        u = raw[h * w : h * w + ch * cw].reshape(ch, cw)
        v = raw[h * w + ch * cw :].reshape(ch, cw)
        if cs.startswith("C420"):  # nearest chroma upsample
            u = u.repeat(2, axis=0)[:h].repeat(2, axis=1)[:, :w]
            v = v.repeat(2, axis=0)[:h].repeat(2, axis=1)[:, :w]
        frames.append(_yuv_to_rgb(np.stack([y, u, v], axis=-1)))
    return np.stack(frames), fps
