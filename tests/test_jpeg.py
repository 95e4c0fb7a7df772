"""Baseline JPEG codec correctness. A symmetric encode/decode bug can
hide from round-trip tests, so the building blocks are each pinned to an
INDEPENDENT reference: the zigzag table against an algorithmic
antidiagonal walk, the DCT matrix against a naive O(n⁴) DCT-II, and
canonical Huffman assignment against the hand-workable standard DC-luma
table. Round trips then bound the lossy error. Pure driver-side."""

import numpy as np
import pytest

from frontier_engine import jpeg as J


def grad(h=33, w=45):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 5) % 256, (y * 7) % 256, (x + y) % 256], axis=2).astype(np.uint8)


def test_zigzag_matches_antidiagonal_walk():
    # independent generation: antidiagonals d=0..14, even d walks
    # up-right (row decreasing), odd d down-left
    want = []
    for d in range(15):
        cells = [(y, d - y) for y in range(max(0, d - 7), min(d, 7) + 1)]
        if d % 2 == 0:
            cells = cells[::-1]
        want += [y * 8 + x for y, x in cells]
    assert J.ZIGZAG.tolist() == want


def test_dct_matrix_matches_naive_dct2():
    rng = np.random.default_rng(1)
    f = rng.normal(size=(8, 8))
    got = J._DCT @ f @ J._DCT.T
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            want[u, v] = 0.25 * cu * cv * s
    assert np.allclose(got, want)
    # and the inverse actually inverts
    assert np.allclose(J._DCT.T @ got @ J._DCT, f)


def test_canonical_codes_standard_dc_luma():
    # T.81 Annex K.3.1 luminance DC table: the canonical codes are
    # hand-derivable — 00, 010..110, 1110, 11110, ...
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    huffval = list(range(12))
    codes = J._canonical_codes(bits, huffval)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[7] == (0b11110, 5)
    assert codes[11] == (0b111111110, 9)


def test_build_table_valid_and_decodable():
    from collections import Counter

    freqs = Counter({0: 1000, 1: 500, 2: 100, 3: 10, 4: 1, 0xF0: 7, 0xA3: 2})
    bits, huffval = J._build_table(freqs)
    assert sum(bits) == len(huffval) == len(freqs)
    codes = J._canonical_codes(bits, huffval)
    # prefix-free: no code is a prefix of another
    as_str = {s: format(c, f"0{l}b") for s, (c, l) in codes.items()}
    vals = list(as_str.values())
    for i, a in enumerate(vals):
        for j, b in enumerate(vals):
            if i != j:
                assert not b.startswith(a)
    # all-ones code of the max length is reserved (never assigned)
    maxlen = max(l for _, l in codes.values())
    assert ("1" * maxlen) not in vals
    # frequent symbols get codes no longer than rare ones
    assert len(as_str[0]) <= len(as_str[4])


def test_roundtrip_gradient_tight():
    img = grad()
    data = J.encode_jpeg(img, quality=90)
    dec, meta = J.decode_jpeg(data)
    assert (meta["width"], meta["height"]) == (45, 33)
    assert meta["sampling"] == [(1, 1), (1, 1), (1, 1)]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2 and err.max() <= 8


def test_roundtrip_noise_bounded_and_stuffed():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    data = J.encode_jpeg(img, quality=95)
    assert b"\xff\x00" in data  # byte stuffing exercised
    dec, _ = J.decode_jpeg(data)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 8 and err.max() < 40


def test_uniform_color_exact():
    uni = np.full((16, 16, 3), 137, dtype=np.uint8)
    dec, _ = J.decode_jpeg(J.encode_jpeg(uni, quality=90))
    assert (dec == 137).all()


def test_grayscale_roundtrip():
    y, x = np.mgrid[0:20, 0:28]
    g = ((x * 3 + y * 2) % 256).astype(np.uint8)
    dec, meta = J.decode_jpeg(J.encode_jpeg(g, quality=92))
    assert meta["components"] == 1 and dec.shape == (20, 28, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 1.5


def test_odd_sizes_and_subsampling():
    img = grad(31, 17)
    data = J.encode_jpeg(img, quality=85, subsample=True)
    dec, meta = J.decode_jpeg(data)
    assert meta["sampling"] == [(2, 2), (1, 1), (1, 1)]
    assert dec.shape == (31, 17, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 6  # chroma halved, luma intact on smooth data


def test_restart_markers_do_not_change_pixels():
    img = grad(24, 40)
    plain = J.encode_jpeg(img, quality=80)
    rst = J.encode_jpeg(img, quality=80, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + k]) in rst for k in range(8))
    d1, _ = J.decode_jpeg(plain)
    d2, m2 = J.decode_jpeg(rst)
    assert m2["restart_interval"] == 2
    assert (d1 == d2).all()  # same quantized blocks, prediction-reset only


def test_rejects_progressive_and_garbage():
    img = grad(8, 8)
    data = bytearray(J.encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2
    with pytest.raises(ValueError, match="progressive"):
        J.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x89PNG\r\n")
