"""Generate the committed perceptual-hash fixture
(fixtures/media_phash.parquet): real PNG payloads + a GOLDEN dHash
column computed from the SOURCE pixel arrays (pre-encode) with an
explicit-loop reference implementation — fully independent of the
engine's decode/resize/hash path, so the CORRECTNESS row catches a
regression anywhere in decode_png / resize_nearest / dhash64.

Corpus (40 rows, media_id deterministic):
  i       = 10 noise base images (48×32 RGB, blake2b-seeded)
  i + 100 = re-encoded copies (filter_strategy 'none' vs 'cycle' —
            different bytes, identical pixels → hamming 0 to base)
  i + 200 = half-size nearest-downscales (hamming = whatever the resample
            does; golden recomputed from the resized pixels)
  i + 300 = one-cell edits (one 9×8-grid comparison inverted → hamming
            exactly 1 to base, asserted below)
"""
import numpy as np
import pandas as pd
from hashlib import blake2b

from frontier_engine import png as P
from frontier_engine.multimodal import _to_gray, dhash64


def noise_image(i: int, w: int = 48, h: int = 32) -> np.ndarray:
    buf = b"".join(
        blake2b(f"phash-{i}-{k}".encode(), digest_size=64).digest()
        for k in range((w * h * 3) // 64 + 1)
    )
    return np.frombuffer(buf[: w * h * 3], dtype=np.uint8).reshape(h, w, 3).copy()


def golden_dhash(arr: np.ndarray) -> int:
    """Reference dHash: plain loops, no engine code. Gray = mean of RGB
    (float32); 9×8 grid cell (y, x) = source pixel (y*H//8, x*W//9);
    bit (y*8+x) set iff grid[y][x] < grid[y][x+1]."""
    h, w = arr.shape[:2]
    gray = [[float(np.float32(sum(float(c) for c in arr[y, x, :3]) / 3.0)) for x in range(w)] for y in range(h)]
    grid = [[gray[(y * h) // 8][(x * w) // 9] for x in range(9)] for y in range(8)]
    bits = 0
    for y in range(8):
        for x in range(8):
            if grid[y][x] < grid[y][x + 1]:
                bits |= 1 << (y * 8 + x)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def main() -> None:
    rows = []

    def add(mid: int, arr: np.ndarray, strategy: str) -> None:
        rows.append(
            {
                "media_id": mid,
                "mime": "image/png",
                "payload": P.encode_png(arr, filter_strategy=strategy),
                "golden_phash": golden_dhash(arr),
            }
        )

    for i in range(10):
        base = noise_image(i)
        add(i, base, "cycle")
        add(i + 100, base, "none")  # re-encode: same pixels, new bytes
        add(i + 200, P.resize_nearest(base, 24, 16), "cycle")
        # one-bit edit: invert comparison bit 0 (grid cell (0,0) vs
        # (0,1)). Cell (0,0) samples source pixel (0, 0) and appears in
        # NO other comparison (dHash compares horizontally adjacent
        # cells), so pushing that one pixel to an extreme flips exactly
        # one bit — asserted below.
        edit = base.copy()
        g01 = _to_gray(base)[0, 5]  # cell (0,1) samples pixel (0, 1*48//9)
        edit[0, 0, :3] = 255 if _to_gray(base)[0, 0] < g01 else 0
        add(i + 300, edit, "cycle")

    df = pd.DataFrame(rows)
    # sanity: engine path (decode payload → gray → dhash) == golden
    from frontier_engine.multimodal import _decode_gray

    for r in rows:
        eng = dhash64(_decode_gray(r["payload"], "image/png"))
        assert eng == r["golden_phash"], f"engine != golden for {r['media_id']}"
    # pair structure: re-encode = 0 hamming, edit = exactly 1
    gold = {r["media_id"]: r["golden_phash"] for r in rows}
    for i in range(10):
        ham = bin((gold[i] ^ gold[i + 100]) & (1 << 64) - 1).count("1")
        assert ham == 0, f"re-encode hamming {ham} for {i}"
        ham = bin((gold[i] ^ gold[i + 300]) & (1 << 64) - 1).count("1")
        assert ham == 1, f"edit hamming {ham} for {i}"
    df.to_parquet("fixtures/media_phash.parquet", index=False)
    n_pairs = sum(
        1
        for a in gold
        for b in gold
        if a < b and bin((gold[a] ^ gold[b]) & (1 << 64) - 1).count("1") <= 3
    )
    print(f"wrote {len(rows)} rows, {n_pairs} near-pairs (hamming<=3)")


if __name__ == "__main__":
    main()
