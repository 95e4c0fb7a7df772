"""Snapshot-store contract: atomic visibility (a torn commit is never
referenced), rollback validation, and manifest lineage chaining."""

import pytest

from frontier_engine.snapshots import SnapshotStore


def _df(spark, n, tag):
    from pyspark.sql import functions as F

    return spark.range(n).select(F.col("id"), F.lit(tag).alias("tag"))


def test_unpublished_commit_is_invisible(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    store.commit(0, {"t": _df(spark, 5, "a")})
    assert store.latest_id() == 0

    # crash window: files written, manifest never published
    entry = store.commit(1, {"t": _df(spark, 9, "b")}, finalize=False)
    assert store.latest_id() == 0  # still the old state
    sid, tables = store.load_latest(spark)
    assert sid == 0 and tables["t"].count() == 5

    # recovery path: the same round can re-commit and publish
    store.publish(entry)
    sid, tables = store.load_latest(spark)
    assert sid == 1 and tables["t"].count() == 9


def test_rollback_and_replay_overwrites(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    for i, n in enumerate((3, 6, 12)):
        store.commit(i, {"t": _df(spark, n, f"v{i}")})
    assert store.latest_id() == 2

    store.rollback(1)
    sid, tables = store.load_latest(spark)
    assert sid == 1 and tables["t"].count() == 6

    # replaying round 2 overwrites the orphaned snap dir
    store.commit(2, {"t": _df(spark, 7, "v2-replay")})
    sid, tables = store.load_latest(spark)
    assert sid == 2 and tables["t"].count() == 7
    # lineage: the replayed manifest's parent is the rolled-back-to snap
    assert store.manifest(2)["parent_id"] == 1


def test_rollback_to_missing_snapshot_raises(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    store.commit(0, {"t": _df(spark, 2, "a")})
    with pytest.raises(FileNotFoundError):
        store.rollback(99)
    assert store.latest_id() == 0
