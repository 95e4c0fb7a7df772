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
    durations = {
        r.media_id: r.meta.duration_s
        for r in media.collect()
        if r.meta.duration_s is not None
    }
    per = {}
    for r in frames:
        per.setdefault(r.media_id, set()).add(r.frame_idx)
    assert set(per) == set(durations)
    for mid, idxs in per.items():
        want = max(1, int(durations[mid] // 5.0))
        assert idxs == set(range(want))
    assert all(len(r.frame) == 48 for r in frames)


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
