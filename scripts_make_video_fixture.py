"""Generate the committed video perceptual-hash fixture
(fixtures/media_video.parquet): REAL MJPEG-in-MP4 payloads + a GOLDEN
first-frame dHash column computed from the SOURCE pixel arrays
(pre-encode) with an explicit-loop reference implementation — fully
independent of the engine's mp4-demux / jpeg-decode / resize / hash
path, so the CORRECTNESS row catches a regression anywhere in
parse_mp4 / extract_sample / decode_jpeg / dhash64.

JPEG is lossy, so golden-from-source only works if compression noise
can never flip a dHash comparison. Frames are therefore piecewise-
constant 45×32 grayscale mosaics aligned to the 9×8 dHash sample grid
(cell (y, x) samples source pixel (4y, 5x) — a block corner), with
adjacent-cell levels forced ≥50 gray levels apart; baseline-JPEG
ringing at these block edges is well under that margin (asserted below
by running the engine path on every payload).

Corpus (24 rows, media_id deterministic):
  i       = 8 mosaic videos (3 frames each, quality 90)
  i + 100 = re-encodes (same source frames, quality 75 — different
            bytes, same comparisons → hamming 0 to base)
  i + 200 = first-frame one-cell edits (one 9×8 comparison inverted →
            hamming exactly 1 to base)
"""
import numpy as np
import pandas as pd
from hashlib import blake2b

from frontier_engine import jpeg as J
from frontier_engine import mp4 as V

LEVELS = [10, 60, 110, 160, 210]
W, H = 45, 32  # dHash samples pixel (4y, 5x) — block corners


def mosaic_levels(i: int, k: int) -> list[list[int]]:
    """9×8 grid of level indices, horizontally-adjacent always distinct."""
    seed = blake2b(f"video-{i}-f{k}".encode(), digest_size=64).digest() + blake2b(
        f"video-{i}-f{k}-b".encode(), digest_size=16
    ).digest()
    grid = []
    p = 0
    for y in range(8):
        row = []
        for x in range(9):
            idx = seed[p] % len(LEVELS)
            p += 1
            if x > 0 and idx == row[-1]:
                idx = (idx + 1) % len(LEVELS)
            row.append(idx)
        grid.append(row)
    # keep cell (0,1) off the extremes so the one-bit edit below can
    # always place cell (0,0) exactly one level across it
    if grid[0][1] in (0, len(LEVELS) - 1):
        grid[0][1] = 2 if grid[0][0] != 2 else 1
    return grid


def mosaic_image(grid: list[list[int]]) -> np.ndarray:
    img = np.zeros((H, W, 3), dtype=np.uint8)
    for y in range(8):
        for x in range(9):
            img[4 * y : 4 * (y + 1), 5 * x : 5 * (x + 1), :] = LEVELS[grid[y][x]]
    return img


def golden_dhash(arr: np.ndarray) -> int:
    """Reference dHash: plain loops, no engine code (same contract as
    scripts_make_phash_fixture.golden_dhash)."""
    h, w = arr.shape[:2]
    gray = [
        [float(np.float32(sum(float(c) for c in arr[y, x, :3]) / 3.0)) for x in range(w)]
        for y in range(h)
    ]
    grid = [[gray[(y * h) // 8][(x * w) // 9] for x in range(9)] for y in range(8)]
    bits = 0
    for y in range(8):
        for x in range(8):
            if grid[y][x] < grid[y][x + 1]:
                bits |= 1 << (y * 8 + x)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def encode_video(frames: list[np.ndarray], quality: int) -> bytes:
    samples = [J.encode_jpeg(f, quality=quality) for f in frames]
    return V.encode_mp4(
        samples, timescale=1000, sample_deltas=1000, width=W, height=H,
        samples_per_chunk=2,
    )


def main() -> None:
    rows = []

    def add(mid: int, frames: list[np.ndarray], quality: int) -> None:
        rows.append(
            {
                "media_id": mid,
                "mime": "video/mp4",
                "payload": encode_video(frames, quality),
                "golden_vhash": golden_dhash(frames[0]),
            }
        )

    for i in range(8):
        grids = [mosaic_levels(i, k) for k in range(3)]
        frames = [mosaic_image(g) for g in grids]
        add(i, frames, 90)
        add(i + 100, frames, 75)  # re-encode: same pixels, new bytes
        # one-bit edit: retarget cell (0,0) so comparison bit 0 flips;
        # cell (0,0) appears in no other comparison
        g0 = [row[:] for row in grids[0]]
        was_lt = LEVELS[g0[0][0]] < LEVELS[g0[0][1]]
        # place (0,0) exactly one level across (0,1): comparison inverts,
        # adjacency-distinct holds, 50-level JPEG-noise margin holds
        g0[0][0] = g0[0][1] + (1 if was_lt else -1)
        add(i + 200, [mosaic_image(g0)] + frames[1:], 90)

    df = pd.DataFrame(rows)
    # sanity 1: engine path (demux → jpeg decode → gray → dhash) == golden
    from frontier_engine.multimodal import _decode_gray, dhash64

    for r in rows:
        got = dhash64(_decode_gray(bytes(r["payload"]), "video/mp4"))
        assert got == r["golden_vhash"], r["media_id"]
    # sanity 2: the planted pair structure holds and nothing collides
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    g = {r["media_id"]: r["golden_vhash"] for r in rows}
    for i in range(8):
        assert ham(g[i], g[i + 100]) == 0
        assert ham(g[i], g[i + 200]) == 1
        for j in range(8):
            if i != j:
                assert ham(g[i], g[j]) > 3, (i, j)

    df.to_parquet("fixtures/media_video.parquet", index=False)
    print(f"wrote fixtures/media_video.parquet: {len(df)} rows")


if __name__ == "__main__":
    main()
