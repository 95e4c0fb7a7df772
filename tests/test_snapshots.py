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


def _disk_bytes(root):
    import os

    total = 0
    for base, _d, files in os.walk(root):
        total += sum(os.path.getsize(os.path.join(base, f)) for f in files)
    return total


def test_expire_keeps_time_travel_and_shrinks_disk(spark, tmp_path):
    """r5 retention GC: expire(keep_last=2) must drop old manifests and
    their data files (disk actually shrinks) while time-travel to every
    RETAINED snapshot still loads, and the store keeps committing."""
    root = str(tmp_path / "snap")
    store = SnapshotStore(root)
    for i in range(6):
        store.commit(i, {"t": _df(spark, 10 + i, f"v{i}"), "u": _df(spark, 3, f"u{i}")})
    before = _disk_bytes(root)

    stats = store.expire(keep_last=2)
    assert stats["retained"] == [5, 4]
    assert stats["removed_snapshots"] == [0, 1, 2, 3]
    assert stats["removed_files"] > 0 and stats["freed_bytes"] > 0
    assert _disk_bytes(root) <= before - stats["freed_bytes"]

    # time-travel within the retained window still works
    assert store.load(spark, 4)["t"].count() == 14
    sid, tables = store.load_latest(spark)
    assert sid == 5 and tables["t"].count() == 15 and tables["u"].count() == 3
    # expired snapshots are gone
    with pytest.raises(FileNotFoundError):
        store.load(spark, 2)
    import os

    assert not os.path.exists(os.path.join(root, "t", "snap-0"))
    # the store keeps working after GC
    store.commit(6, {"t": _df(spark, 2, "v6"), "u": _df(spark, 1, "u6")})
    assert store.load_latest(spark)[0] == 6
    assert store.manifest(6)["parent_id"] == 5


def test_expire_collects_rolled_back_branch(spark, tmp_path):
    """Snapshots on a branch abandoned by rollback are unreferenced
    regardless of id order — lineage-walk retention collects them."""
    store = SnapshotStore(str(tmp_path / "snap"))
    for i in range(5):
        store.commit(i, {"t": _df(spark, 5 + i, f"v{i}")})
    store.rollback(2)
    store.commit(6, {"t": _df(spark, 99, "v6")})  # parent = 2

    stats = store.expire(keep_last=2)
    assert stats["retained"] == [6, 2]
    # 3 and 4 sat on the abandoned branch; 0 and 1 are past the window
    assert stats["removed_snapshots"] == [0, 1, 3, 4]
    assert store.load(spark, 2)["t"].count() == 7
    assert store.load(spark, 6)["t"].count() == 99


def test_expire_edge_cases(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    assert store.expire(keep_last=3)["retained"] == []  # empty store
    store.commit(0, {"t": _df(spark, 2, "a")})
    with pytest.raises(ValueError):
        store.expire(keep_last=0)
    stats = store.expire(keep_last=5)  # window larger than history
    assert stats["retained"] == [0] and stats["removed_snapshots"] == []
    assert store.load_latest(spark)[0] == 0


def test_re_expire_with_larger_window_stops_at_truncated_chain(spark, tmp_path):
    """A previous expire(keep_last=2) deleted older manifests; a later
    expire(keep_last=3) must neither crash on nor retain the expired
    ancestor — the lineage walk ends where the manifests end."""
    store = SnapshotStore(str(tmp_path / "snap"))
    for i in range(4):
        store.commit(i, {"t": _df(spark, 5 + i, "a")})
    store.expire(keep_last=2)  # drops manifests 0 and 1
    stats = store.expire(keep_last=3)  # wants 3, chain only has 2
    assert stats["retained"] == [3, 2]
    assert stats["removed_snapshots"] == []
    assert store.load(spark, 2)["t"].count() == 7  # time-travel intact
    assert store.load_latest(spark)[0] == 3


def test_expire_keeps_meta_referenced_delta_chains(spark, tmp_path):
    """The crawl store commits each round's frontier delta as THAT
    round's table and records the live union chain in the manifest
    ``meta`` (crawler.py: fstate.to_meta() → base_paths/delta_paths/
    status_paths). expire() must treat meta-referenced dirs as live —
    keep_last=2 after 6 non-compacting rounds would otherwise delete
    rounds 0-3's delta dirs out from under the head state and break
    resume (ADVICE-class data loss)."""
    import os

    root = str(tmp_path / "snap")
    store = SnapshotStore(root)
    chain: list[str] = []
    for i in range(6):
        entry = store.commit(
            i, {"frontier_delta": _df(spark, 4 + i, f"d{i}")}, finalize=False
        )
        chain.append(entry["tables"]["frontier_delta"]["path"])
        entry["meta"]["frontier"] = {"delta_paths": list(chain)}
        store.publish(entry)

    stats = store.expire(keep_last=2)
    assert stats["retained"] == [5, 4]
    # every chain member survives: the head manifest's meta references it
    for p in chain:
        assert os.path.exists(p), p
    # the resume-style union read over the full chain still works
    total = spark.read.parquet(*chain).count()
    assert total == sum(4 + i for i in range(6))
    # nothing was deletable here, so no files were removed
    assert stats["removed_files"] == 0
    # but the stale manifests themselves are gone
    assert stats["removed_snapshots"] == [0, 1, 2, 3]
