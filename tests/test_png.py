"""Pure-stdlib PNG codec: filter reversal on every filter type, all
supported color types, the committed golden fixture, and nearest-resize
semantics (round-3 — the real bytes under multimodal's image stages)."""

import os

import numpy as np
import pytest

from frontier_engine import png as P

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_8x6.png")


def _img(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("ch,colortype", [(1, 0), (2, 4), (3, 2), (4, 6)])
def test_roundtrip_all_color_types_and_filters(ch, colortype):
    """encode(filter cycle) → decode must be pixel-exact: with ≥5 rows
    the cycle strategy writes every filter type (None/Sub/Up/Average/
    Paeth), so decode's reversal of each is exercised against an
    independent forward implementation."""
    img = _img(ch, 9, 7, ch)
    data = P.encode_png(img, filter_strategy="cycle")
    arr, meta = P.decode_png(data)
    assert meta["colortype"] == colortype
    want = img if img.ndim == 3 else img[:, :, None]
    assert arr.shape == want.shape
    assert (arr == want).all()


def test_roundtrip_1px_wide():
    img = _img(5, 6, 1, 3)
    assert (P.decode_png(P.encode_png(img, "cycle"))[0] == img).all()


def test_palette_decoding():
    """Hand-built color-type-3 PNG: palette indices expand to RGB."""
    import struct
    import zlib

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    data = (
        P.SIGNATURE
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", plte)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )
    arr, meta = P.decode_png(data)
    assert meta["channels"] == 3
    assert (arr[0, 0] == [255, 0, 0]).all()
    assert (arr[0, 2] == [0, 0, 255]).all()
    assert (arr[1, 0] == [0, 0, 255]).all()


def test_committed_golden_fixture_pixels():
    """The COMMITTED PNG file decodes to the golden formula pixels:
    pixel(y, x) = ((x*7) % 256, (y*5) % 256, (x+y) % 256) on an 8×6
    canvas — any codec or fixture drift fails here."""
    with open(FIXTURE, "rb") as f:
        data = f.read()
    arr, meta = P.decode_png(data)
    assert (meta["width"], meta["height"], meta["channels"]) == (8, 6, 3)
    y, x = np.mgrid[0:6, 0:8]
    want = np.stack([(x * 7) % 256, (y * 5) % 256, (x + y) % 256], axis=2)
    assert (arr == want).all()


def test_crc_validation_rejects_corruption():
    img = _img(9, 4, 4, 3)
    data = bytearray(P.encode_png(img))
    data[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC|signature"):
        P.decode_png(bytes(data))


def test_resize_nearest_semantics():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = P.resize_nearest(img, 2, 2)
    assert (out == [[0, 2], [8, 10]]).all()
    up = P.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    assert (up[::2, ::2] == img).all()
