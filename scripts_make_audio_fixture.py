"""Generate the committed audio-fingerprint fixture
(fixtures/media_audio.parquet): real RIFF/PCM16 WAV payloads + a GOLDEN
fingerprint column computed from the PAYLOAD BYTES by an independent
reference implementation — its own struct-level WAV reader and an
explicit O(n²) DFT-matrix spectrogram (vs the engine's numpy rFFT), so
the CORRECTNESS row catches a regression anywhere in decode_wav /
spectrogram_grid / dhash64 / the Hamming banding.

Corpus (40 rows, media_id deterministic):
  i       = 10 base signals (two tones + seeded noise, 0.9 s @ 2 kHz)
  i + 100 = byte-different re-encodes (LIST/INFO chunk injected —
            identical PCM → hamming 0 to base, asserted)
  i + 200 = gain-halved copies (fingerprint is log-energy so gain
            cancels; 16-bit requantization may flip near-tie bits —
            asserted hamming ≤ 2 to base)
  i + 300 = different-seed signals (far pairs, hamming > 10 to base)
"""

import cmath
import struct

import numpy as np
import pandas as pd

from frontier_engine import wav as W
from frontier_engine.multimodal import _decode_gray, dhash64


def signal(i: int, seed_salt: int = 0, rate: int = 2000, dur_s: float = 0.9) -> np.ndarray:
    t = np.arange(int(dur_s * rate)) / rate
    f1 = 100.0 + (i * 29) % 500
    f2 = 250.0 + (i * 41) % 600
    noise = np.random.default_rng(500 + i + seed_salt * 7919).normal(0.0, 0.15, len(t))
    return 0.35 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.sin(2 * np.pi * f2 * t) + noise


# ---------------- independent reference implementation ----------------


def ref_decode_pcm16(data: bytes) -> tuple[list[float], int]:
    """Struct-level WAV reader, independent of frontier_engine.wav:
    walks RIFF chunks with unpack_from, converts PCM16 via int.from_bytes."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"fmt ":
            tag, ch, rate, _bps, _blk, bits = struct.unpack_from("<HHIIHH", body)
            assert tag == 1 and ch == 1 and bits == 16
        elif fourcc == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    vals = [
        int.from_bytes(pcm[k : k + 2], "little", signed=True) / 32768.0
        for k in range(0, len(pcm), 2)
    ]
    return vals, rate


def ref_fingerprint(data: bytes) -> int:
    """Reference band-energy-delta fingerprint: explicit DFT matrix
    (numpy outer-product evaluation of the definition — a different
    algorithm from the engine's rFFT), Hann window, equal band pooling
    excluding DC, log10, transposed grid, plain-loop dHash."""
    vals, _rate = ref_decode_pcm16(data)
    n_time, n_bands = 9, 8
    frame = len(vals) // n_time
    if frame % 2:
        frame -= 1
    x = np.array(vals, dtype=np.float64)
    win = np.array(
        [0.5 - 0.5 * cmath.cos(2 * cmath.pi * k / frame).real for k in range(frame)]
    )
    k = np.arange(frame // 2 + 1)
    n = np.arange(frame)
    dft = np.exp(-2j * np.pi * np.outer(k, n) / frame)  # (bins, frame)
    grid = [[0.0] * n_bands for _ in range(n_time)]
    for t in range(n_time):
        seg = x[t * frame : (t + 1) * frame] * win
        spec = dft @ seg
        power = (spec.real**2 + spec.imag**2)[1:]
        per = len(power) // n_bands
        for b in range(n_bands):
            hi = (b + 1) * per if b < n_bands - 1 else len(power)
            grid[t][b] = float(np.log10(power[b * per : hi].sum() + 1e-12))
    # transpose to (band, time) = the engine's audio "gray plane", then
    # dHash: float32 grid, bit (y*8+x) iff g[y][x] < g[y][x+1]
    g = [[np.float32(grid[t][b]) for t in range(n_time)] for b in range(n_bands)]
    bits = 0
    for y in range(8):
        for x_ in range(8):
            if g[y][x_] < g[y][x_ + 1]:
                bits |= 1 << (y * 8 + x_)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def main() -> None:
    rows = []

    def add(mid: int, payload: bytes) -> None:
        rows.append(
            {
                "media_id": mid,
                "mime": "audio/wav",
                "payload": payload,
                "golden_fp": ref_fingerprint(payload),
            }
        )

    for i in range(10):
        base = signal(i)
        add(i, W.encode_wav(base, 2000))
        add(i + 100, W.encode_wav(base, 2000, extra_chunks=[(b"LIST", b"INFOIART\x06\x00\x00\x00synth\x00")]))
        # gain-halved: apply to the decoded (quantized) floats, like a
        # real volume-normalization re-encode would
        dec, _ = W.decode_wav(W.encode_wav(base, 2000))
        add(i + 200, W.encode_wav(0.5 * dec[:, 0], 2000))
        add(i + 300, W.encode_wav(signal(i, seed_salt=1), 2000))

    # sanity 1: engine path (decode payload → spectrogram → dhash) ==
    # independent golden, for every row
    for r in rows:
        eng = dhash64(_decode_gray(r["payload"], "audio/wav"))
        assert eng == r["golden_fp"], f"engine != golden for {r['media_id']}"
    # sanity 2: planted pair structure
    gold = {r["media_id"]: r["golden_fp"] for r in rows}
    ham = lambda a, b: bin((gold[a] ^ gold[b]) & ((1 << 64) - 1)).count("1")
    for i in range(10):
        assert ham(i, i + 100) == 0, f"re-encode hamming {ham(i, i+100)} for {i}"
        assert ham(i, i + 200) <= 2, f"gain hamming {ham(i, i+200)} for {i}"
        assert ham(i, i + 300) > 10, f"far hamming {ham(i, i+300)} for {i}"

    pd.DataFrame(rows).to_parquet("fixtures/media_audio.parquet", index=False)
    n_pairs = sum(1 for a in gold for b in gold if a < b and ham(a, b) <= 3)
    print(f"wrote {len(rows)} rows, {n_pairs} near-pairs (hamming<=3)")


if __name__ == "__main__":
    main()
