"""Pure-stdlib PNG codec (zlib inflate + per-scanline filter reversal) —
the real byte-level decode under ``multimodal``'s image stages.

This container ships no image libraries (no PIL/opencv), but PNG needs
none: the format is zlib-compressed scanlines, each prefixed with one of
five difference filters (PNG spec, RFC 2083 §6). Implemented here:

* ``decode_png``  — 8-bit depth, non-interlaced, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) → uint8 ndarray
  (H, W, C) plus metadata. All five scanline filters (None/Sub/Up/
  Average/Paeth) are reversed exactly.
* ``encode_png``  — the inverse (forward filtering + zlib), with a
  per-row filter strategy so round-trip tests exercise EVERY filter
  path against an independently-implemented reverse.
* ``resize_nearest`` — deterministic nearest-neighbor resample (numpy
  index arithmetic; the resize semantics a PIL-free pipeline can pin).

Scope note: this is a correctness-grade codec for the multimodal
pipeline's decode stage, not a performance-grade one — per-scanline
filter reversal is sequential by spec (each byte depends on the
reconstructed left neighbor). At 100 TB the decode stage is
embarrassingly parallel across rows/files, which is where the
parallelism belongs; a C-backed codec slots into the same seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(data: bytes):
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            break


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """→ (uint8 array of shape (H, W, channels), meta dict). Palette
    images come back expanded to RGB."""
    width = height = None
    bitdepth = colortype = interlace = None
    plte = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8:
        raise ValueError(f"unsupported bit depth {bitdepth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if colortype not in _CHANNELS:
        raise ValueError(f"unsupported color type {colortype}")
    ch = _CHANNELS[colortype]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")

    recon = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized (no left dependency)
            cur = (line + prior) & 0xFF
        else:  # Sub / Average / Paeth need the reconstructed left byte
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:  # Sub
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    cur[i] = (line[i] + _paeth(int(a), int(b), int(c))) & 0xFF
                else:
                    raise ValueError(f"bad filter type {ftype}")
        recon[y] = cur.astype(np.uint8)
        prior = cur

    arr = recon.reshape(height, width, ch)
    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[:, :, 0]]
        ch = 3
    meta = {"width": width, "height": height, "channels": ch, "colortype": colortype}
    return arr, meta


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_strategy: str = "cycle") -> bytes:
    """uint8 (H, W) or (H, W, C) → PNG bytes. ``filter_strategy``:
    ``"none"`` writes filter 0 rows; ``"cycle"`` rotates through all five
    filters row-by-row so decoders must reverse every one."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = a.reshape(h, stride).astype(np.int32)
    bpp = ch
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        ftype = (y % 5) if filter_strategy == "cycle" else 0
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]]) if stride > bpp else np.zeros(stride, dtype=np.int32)
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prior[:-bpp]]) if stride > bpp else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - ((left + prior) >> 1)
        else:  # Paeth
            filt = np.array(
                [cur[i] - _paeth(int(left[i]), int(prior[i]), int(ul[i])) for i in range(stride)],
                dtype=np.int32,
            )
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: output pixel (y, x) takes
    source pixel (floor(y·H/out_h), floor(x·W/out_w))."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return a[ys][:, xs]
