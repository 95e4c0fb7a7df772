"""Multimodal plumbing: schemas, pruning-friendly stages, deterministic
stub codec (real decode is a documented drop-in point)."""

import pytest
from pyspark.sql import functions as F

from frontier_engine import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, 32).cache()


def test_feature_extraction_shape_and_determinism(media):
    f1 = {r.media_id: r for r in M.extract_features(media).collect()}
    f2 = {r.media_id: r for r in M.extract_features(media).collect()}
    assert len(f1) == 32
    for mid, r in f1.items():
        assert len(r.features) == 16
        assert r.n_bytes > 0 and len(r.sha_prefix) == 16
        assert r.features == f2[mid].features  # stub decode is deterministic


def test_frame_sampling_counts(media):
    frames = M.sample_frames(media, every_s=5.0).collect()
    rows = {r.media_id: r for r in media.collect()}
    durations = {
        mid: r.meta.duration_s for mid, r in rows.items() if r.meta.duration_s is not None
    }
    per = {}
    for r in frames:
        per.setdefault(r.media_id, set()).add(r.frame_idx)
    assert set(per) == set(durations)
    for mid, idxs in per.items():
        want = max(1, int(durations[mid] // 5.0))
        assert idxs == set(range(want))
    # wav rows: real WAV windows; mp4 rows: real container samples
    assert all(
        bytes(r.frame)[:4] == b"RIFF"
        for r in frames
        if rows[r.media_id].mime == "audio/wav"
    )
    from frontier_engine import jpeg as J
    from frontier_engine import mp4 as V
    from frontier_engine import png as P

    import numpy as np

    checked = 0
    for r in frames:
        src = rows[r.media_id]
        if src.mime != "video/mp4":
            continue
        # r5: MJPEG samples decode to REAL pixels, emitted as standalone
        # PNG frames — driver-side: demux the source sample, decode its
        # JPEG, and require pixel-exact equality with the PNG frame
        raw = bytes(src.payload)
        tbl = V.parse_mp4(raw)["samples"]
        si = V.sample_at_time(tbl, r.frame_idx * 5.0)
        sample = V.extract_sample(raw, tbl, si)
        assert sample[:2] == J.SOI
        want, _ = J.decode_jpeg(sample)
        frame = bytes(r.frame)
        assert frame[:8] == P.SIGNATURE
        got, _ = P.decode_png(frame)
        assert np.array_equal(got, want)
        checked += 1
    assert checked > 0


def test_wav_frames_are_exact_pcm_windows(media):
    """Round-4: audio frames must be the REAL [idx·5s, (idx+1)·5s) PCM
    window of the source signal, re-encoded — verified by driver-side
    decode of both the source payload and each frame payload."""
    from frontier_engine import wav as W

    frames = M.sample_frames(media, every_s=5.0).collect()
    src = {r.media_id: r for r in media.collect() if r.mime == "audio/wav"}
    checked = 0
    for r in frames:
        if r.media_id not in src:
            continue
        full, meta = W.decode_wav(bytes(src[r.media_id].payload))
        want = W.slice_window(full, meta["sample_rate"], r.frame_idx * 5.0, 5.0)
        got, gmeta = W.decode_wav(bytes(r.frame))
        assert gmeta["sample_rate"] == meta["sample_rate"]
        assert (got == want).all()
        checked += 1
    assert checked > 0


def test_wav_rows_use_real_codec_features(media):
    """Round-4 twin of the PNG feature test: audio/wav rows' features
    must come from the REAL decoded PCM (decode → 8×8 log-spectrogram →
    pooled), matching a driver-side recomputation from the known
    synthesis formula."""
    import numpy as np

    from frontier_engine import wav as W
    from frontier_engine.multimodal import SYNTH_SAMPLE_RATE, _tone_signal

    feats = {r.media_id: r.features for r in M.extract_features(media).collect()}
    wav_ids = [r.media_id for r in media.collect() if r.mime == "audio/wav"]
    assert wav_ids
    for mid in wav_ids:
        dur = float(1 + mid % 30)
        # driver-side: quantize like the encoder, decode like the decoder
        q = W._quantize(_tone_signal(mid, dur), 16).astype(np.float32) / 32768.0
        grid = W.spectrogram_grid(q, n_time=8, n_bands=8)
        pooled = grid.mean(axis=0)
        want = np.concatenate([pooled, grid.std(axis=1)])[:16].astype(np.float32)
        assert np.allclose(feats[mid], want), mid


def test_probe_media_matches_stored_meta(media):
    """Round-4: probe_media re-derives the typed metadata from REAL
    payload bytes for all four mimes (PNG IHDR, JPEG SOF, WAV fmt,
    MP4 moov) — it must agree with the synthesized meta columns, and a
    corrupt payload must come back format_ok=false, not an error."""
    probed = {r.media_id: r for r in M.probe_media(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(probed) == len(src)
    for mid, p in probed.items():
        s = src[mid]
        assert p.format_ok, (mid, s.mime)
        assert p.width == s.meta.width and p.height == s.meta.height
        if s.meta.duration_s is None:
            assert p.duration_s is None
        else:
            assert abs(p.duration_s - s.meta.duration_s) < 1e-9
        if s.mime == "video/mp4":
            assert p.n_samples == int(s.meta.duration_s)
    # dirty payload → format_ok False
    garbage = media.limit(1).withColumn(
        "payload", F.lit(b"\xff\xfe not a container")
    )
    bad = M.probe_media(garbage).collect()[0]
    assert not bad.format_ok and bad.codec is None


def test_resize_images_only(media):
    out = M.resize_images(media, 224, 224).collect()
    n_images = media.where(F.col("mime").startswith("image/")).count()
    assert len(out) == n_images
    assert all(r.meta.width == 224 and r.meta.height == 224 for r in out)


def test_metadata_filter_prunes_payload(media, spark, tmp_path):
    """Filtering on metadata must not read payload bytes: the parquet
    scan's ReadSchema for a meta-only query excludes the payload column."""
    path = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(path)
    df = (
        spark.read.parquet(path)
        .select("media_id", "mime", "meta")
        .where(F.col("meta")["width"] == 640)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and all("payload" not in ln for ln in scan)


def test_png_rows_use_real_codec_features(media, spark):
    """Round-3: image/png rows' features must come from the REAL decoded
    pixels (decode → grayscale → 8×8 nearest grid → pooled), matching a
    driver-side recomputation from the known gradient formula."""
    import numpy as np

    from frontier_engine import png as P
    from frontier_engine.multimodal import _gradient_image, _to_gray

    feats = {r.media_id: r.features for r in M.extract_features(media).collect()}
    png_ids = [r.media_id for r in media.collect() if r.mime == "image/png"]
    assert png_ids
    for mid in png_ids:
        grid = P.resize_nearest(_to_gray(_gradient_image(mid)), 8, 8).astype(np.float32)
        pooled = grid.mean(axis=0)
        want = np.concatenate([pooled, grid.std(axis=1)])[:16].astype(np.float32)
        assert np.allclose(feats[mid], want), mid


def test_resize_produces_valid_png_of_requested_size(media):
    """Round-3: resized PNG payloads are themselves decodable PNGs at the
    requested dimensions, equal to nearest-neighbor of the source."""
    import numpy as np

    from frontier_engine import png as P
    from frontier_engine.multimodal import _gradient_image

    out = {r.media_id: r for r in M.resize_images(media, 12, 10).collect()}
    png_ids = [r.media_id for r in media.collect() if r.mime == "image/png"]
    for mid in png_ids:
        arr, meta = P.decode_png(bytes(out[mid].payload))
        assert (meta["width"], meta["height"]) == (12, 10)
        want = P.resize_nearest(_gradient_image(mid), 12, 10)
        assert (arr == want).all()


def test_jpeg_rows_use_real_codec_features(media):
    """Round-4: image/jpeg rows' features must come from the REAL
    baseline-JPEG decoded pixels — matching a driver-side recomputation
    that decodes the same payload with frontier_engine.jpeg directly."""
    import numpy as np

    from frontier_engine import jpeg as J
    from frontier_engine import png as P
    from frontier_engine.multimodal import _to_gray

    feats = {r.media_id: r.features for r in M.extract_features(media).collect()}
    jrows = [r for r in media.collect() if r.mime == "image/jpeg"]
    assert jrows
    for r in jrows:
        arr, _meta = J.decode_jpeg(bytes(r.payload))
        grid = P.resize_nearest(_to_gray(arr), 8, 8).astype(np.float32)
        pooled = grid.mean(axis=0)
        want = np.concatenate([pooled, grid.std(axis=1)])[:16].astype(np.float32)
        assert np.allclose(feats[r.media_id], want), r.media_id
        # and the decode is honest: pixels near the known source formula
        src = M._gradient_image(r.media_id)
        assert np.abs(arr.astype(int) - src.astype(int)).mean() < 12


def test_resize_produces_valid_jpeg_of_requested_size(media):
    """Round-4: resized JPEG payloads are themselves decodable baseline
    JPEGs at the requested dimensions, close to nearest-neighbor of the
    decoded source."""
    import numpy as np

    from frontier_engine import jpeg as J
    from frontier_engine import png as P

    out = {r.media_id: r for r in M.resize_images(media, 12, 10).collect()}
    jrows = [r for r in media.collect() if r.mime == "image/jpeg"]
    for r in jrows:
        arr, meta = J.decode_jpeg(bytes(out[r.media_id].payload))
        assert (meta["width"], meta["height"]) == (12, 10)
        src, _ = J.decode_jpeg(bytes(r.payload))
        want = P.resize_nearest(src, 12, 10)
        assert np.abs(arr.astype(int) - want.astype(int)).mean() < 12


def test_jpeg_reencode_lands_near_in_hamming(spark):
    """dHash over real JPEG decode: a quality-75 4:2:0 re-encode of the
    same image lands within 3 Hamming bits (the near-dup family's
    banding recall bound), while a different image lands far. Uses
    smooth random images (sum of random 2-D cosines): gradients are
    dHash-degenerate (constant offsets) and pixel noise is not
    JPEG-stable, but smooth fields are both distinct and robust."""
    import numpy as np

    from frontier_engine import jpeg as J

    def smooth(seed, h=32, w=48):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        plane = sum(
            rng.uniform(40, 90) * np.cos(2 * np.pi * (fx * x / w + fy * y / h) + rng.uniform(0, 6))
            for fx, fy in [(1, 0), (0, 1), (1, 1), (2, 1)]
        )
        img = 128 + plane - plane.mean()
        return np.clip(np.stack([img] * 3, axis=2), 0, 255).astype(np.uint8)

    a, b = smooth(1), smooth(2)
    h90 = M.dhash64(M._decode_gray(J.encode_jpeg(a, quality=90), "image/jpeg"))
    h75 = M.dhash64(M._decode_gray(J.encode_jpeg(a, quality=75, subsample=True), "image/jpeg"))
    hb = M.dhash64(M._decode_gray(J.encode_jpeg(b, quality=90), "image/jpeg"))
    assert bin((h90 ^ h75) & ((1 << 64) - 1)).count("1") <= 3
    assert bin((h90 ^ hb) & ((1 << 64) - 1)).count("1") > 10


def test_dhash_reencode_invariant_and_edit_sensitivity(spark):
    """dHash is invariant to re-encoding (same pixels, different PNG
    filter strategies → identical hash) and a 2× nearest upscale (the
    9×8 downsample grid lands on the same source pixels), while a
    genuinely different image lands far away in Hamming distance."""
    import numpy as np

    from frontier_engine import png as P

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    other = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    h_cycle = M.dhash64(M._decode_gray(P.encode_png(img, "cycle"), "image/png"))
    h_none = M.dhash64(M._decode_gray(P.encode_png(img, "none"), "image/png"))
    up = P.resize_nearest(img, 96, 64)
    h_up = M.dhash64(M._decode_gray(P.encode_png(up, "cycle"), "image/png"))
    h_other = M.dhash64(M._decode_gray(P.encode_png(other, "cycle"), "image/png"))
    assert h_cycle == h_none == h_up
    ham = bin((h_cycle ^ h_other) & ((1 << 64) - 1)).count("1")
    assert ham > 10


def test_phash_near_pairs_matches_committed_golden(spark):
    """phash_near_pairs over the committed fixture must equal the
    all-pairs ≤3-Hamming set computed from the golden_phash column (the
    banding recall guarantee + decode/hash correctness in one check)."""
    import os

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "media_phash.parquet",
    )
    media = spark.read.parquet(fixture)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in M.phash_near_pairs(
            media.select("media_id", "mime", "payload"), max_hamming=3
        ).collect()
    }
    gold = {r.media_id: r.golden_phash for r in media.select("media_id", "golden_phash").collect()}
    want = {}
    for a in gold:
        for b in gold:
            if a < b:
                h = bin((gold[a] ^ gold[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    want[(a, b)] = h
    assert got == want
    # the fixture plants structure: every re-encode pairs at hamming 0,
    # every one-bit edit at hamming 1
    assert all(got[(i, i + 100)] == 0 for i in range(10))
    assert all(got[(i, i + 300)] == 1 for i in range(10))


def test_audio_near_pairs_matches_committed_golden(spark):
    """Round-4 twin of the phash fixture test over REAL WAV payloads:
    phash_near_pairs (decode → log-spectrogram → band-energy-delta
    dHash → banding) must equal the all-pairs ≤3-Hamming set computed
    from the golden_fp column (independent struct-reader + DFT-matrix
    reference, scripts_make_audio_fixture.py)."""
    import os

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "media_audio.parquet",
    )
    media = spark.read.parquet(fixture)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in M.phash_near_pairs(
            media.select("media_id", "mime", "payload"), max_hamming=3
        ).collect()
    }
    gold = {r.media_id: r.golden_fp for r in media.select("media_id", "golden_fp").collect()}
    want = {}
    for a in gold:
        for b in gold:
            if a < b:
                h = bin((gold[a] ^ gold[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    want[(a, b)] = h
    assert got == want
    # planted structure: byte-different re-encodes at hamming 0,
    # gain-halved copies within quantization tolerance
    assert all(got[(i, i + 100)] == 0 for i in range(10))
    assert all(got.get((i, i + 200), 99) <= 2 for i in range(10))


def test_video_phash_golden_fixture(spark):
    """r5: MJPEG-in-MP4 near-dup — engine hash (demux → jpeg decode →
    gray → dhash) must equal the fixture's golden_vhash (computed from
    SOURCE pixels by an independent explicit-loop implementation), and
    the planted pair structure must come out of the banded join."""
    import os

    fixture = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media_video.parquet")
    media = spark.read.parquet(fixture)
    hashes = {
        r.media_id: r.phash
        for r in M.phash_media(media.select("media_id", "mime", "payload")).collect()
    }
    gold = {r.media_id: r.golden_vhash for r in media.select("media_id", "golden_vhash").collect()}
    assert hashes == gold
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in M.phash_near_pairs(
            media.select("media_id", "mime", "payload"), max_hamming=3
        ).collect()
    }
    assert all(got[(i, i + 100)] == 0 for i in range(8))  # re-encode
    assert all(got[(i, i + 200)] == 1 for i in range(8))  # one-cell edit
    assert all(got[(i + 100, i + 200)] == 1 for i in range(8))
    assert len(got) == 24  # nothing else within hamming 3
