"""Cuckoo-filter shards (north-star fallback membership structure):
no-false-negatives, delete support, load behavior — numpy kernels tested
without Spark; Spark wrappers integration-tested at the end."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frontier_engine import cuckoo as C

NB = 1 << 10  # 1024 buckets × 4 slots = 4096 capacity


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_inserted_keys_never_false_negative():
    keys = _keys(3000, 1)  # ~73% load
    blob = C.insert(C.empty_filter(NB), keys, NB)
    assert C.contains(blob, keys, NB).all()


def test_fpr_sane_on_unseen_keys():
    blob = C.insert(C.empty_filter(NB), _keys(3000, 2), NB)
    fpr = C.contains(blob, _keys(20000, 3), NB).mean()
    assert fpr < 0.05  # 16-bit fingerprints, 2 buckets × 4 slots → ~0.1%


def test_delete_removes_membership_and_is_safe():
    keys = _keys(1000, 4)
    blob = C.insert(C.empty_filter(NB), keys, NB)
    gone, kept = keys[:100], keys[100:]
    blob = C.delete(blob, gone, NB)
    assert C.contains(blob, kept, NB).all()          # survivors intact
    assert C.contains(blob, gone, NB).mean() < 0.05  # deleted mostly gone
    # deleting a never-inserted key is a no-op for membership semantics
    blob2 = C.delete(blob, _keys(50, 5), NB)
    assert C.contains(blob2, kept, NB).mean() > 0.95


def test_colliding_keys_survive_delete_of_one():
    """Two DIFFERENT keys that collide on (bucket, fingerprint) must both
    keep one slot copy, so deleting one never erases the other's
    membership (the ADVICE r2 false-negative bug: an idempotent insert
    stored a single copy for both)."""
    fp = 5
    a = np.array([(fp << 48) | 100], dtype=np.int64)          # b1 = 100
    b = np.array([(fp << 48) | 100 + NB * 7], dtype=np.int64)  # same fp, same b1
    blob = C.insert(C.empty_filter(NB), np.concatenate([a, b]), NB)
    blob = C.delete(blob, a, NB)
    assert C.contains(blob, b, NB).all()  # B still a member
    blob = C.delete(blob, b, NB)
    assert not C.contains(blob, b, NB).any()  # both copies now gone


def test_delete_shards_dedupes_expired_batch(spark):
    """ADVICE r3: a url_hash duplicated within one expire batch must
    remove at most ONE slot copy. A key holding two copies (inserted by
    two update calls — the multiset discipline) keeps its second copy
    when the expire frame lists it twice; without the dedup both copies
    would vanish and a colliding live key could lose membership."""
    from pyspark.sql import functions as F

    from frontier_engine.seen import SHARD_SCHEMA

    n_shards, nb = 4, 1 << 10
    key = spark.range(1).select(F.xxhash64(F.lit("dup-key")).alias("url_hash"))
    empty = spark.createDataFrame([], SHARD_SCHEMA)
    shards = C.update_cuckoo_shards(key, empty, n_shards, nb)
    shards = C.update_cuckoo_shards(key, shards, n_shards, nb)  # 2nd copy
    expired_dup = key.unionByName(key)  # same hash twice in one batch
    shards = C.delete_cuckoo_shards(expired_dup, shards, n_shards, nb)
    still = C.cuckoo_positive_hashes_broadcast(key, shards, n_shards, nb)
    assert still.count() == 1  # one copy survived the duplicated expire


def test_non_power_of_two_buckets_rejected():
    with pytest.raises(ValueError, match="power of two"):
        C.empty_filter(1000)
    with pytest.raises(ValueError, match="power of two"):
        C.insert(C.empty_filter(NB), _keys(5, 8), 1000)


def test_high_load_uses_stash_not_failure():
    keys = _keys(3900, 7)  # ~95% load
    blob = C.insert(C.empty_filter(NB), keys, NB)
    assert C.contains(blob, keys, NB).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=200))
def test_property_membership_after_insert(xs):
    keys = np.array(xs, dtype=np.int64)
    blob = C.insert(C.empty_filter(256), keys, 256)
    assert C.contains(blob, keys, 256).all()


def test_spark_wrappers_roundtrip(spark):
    """Cuckoo shards through the Spark surface: update → broadcast check →
    exact-set semantics after confirm (same discipline as the bloom)."""
    from pyspark.sql import functions as F

    from frontier_engine.seen import SHARD_SCHEMA

    n_shards, nb = 8, 1 << 12
    df = spark.range(20000).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    seen = df.where(F.col("url_hash") % 2 == 0)  # half
    empty = spark.createDataFrame([], SHARD_SCHEMA)
    shards = C.update_cuckoo_shards(seen, empty, n_shards, nb)
    positives = C.cuckoo_positive_hashes_broadcast(df, shards, n_shards, nb)
    pos = {r.url_hash for r in positives.collect()}
    inserted = {r.url_hash for r in seen.collect()}
    assert inserted <= pos                       # no false negatives
    assert len(pos - inserted) < len(inserted) * 0.05  # few false positives


def test_filter_unseen_cuckoo_exact_semantics(spark):
    """filter_unseen(filter_kind='cuckoo') must equal the plain anti-join
    (the filter only prunes the confirm; exactness is preserved)."""
    from pyspark.sql import functions as F

    from frontier_engine import seen as S
    from frontier_engine.canon import with_canon_columns

    n_shards, nb = 8, 1 << 12
    urls = spark.range(8000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 40).cast("string"),
                 F.lit(".x/p/"), F.col("id")).alias("url")
    )
    cand = with_canon_columns(urls)
    seen = cand.where(F.col("url_hash") % 3 == 0)
    shards = C.update_cuckoo_shards(
        seen, spark.createDataFrame([], S.SHARD_SCHEMA), n_shards, nb
    )
    exact = seen.select("url_hash", "canon_url")
    out = S.filter_unseen(cand, shards, exact, n_shards, nb, 0, filter_kind="cuckoo")
    expected = cand.join(seen.select("url_hash"), "url_hash", "left_anti")
    assert {r.url for r in out.collect()} == {r.url for r in expected.collect()}


def test_cuckoo_crawl_parity_with_bloom(spark, tmp_path_factory):
    """A cuckoo-backed crawl visits the same batches in the same order and
    ends with the same seen set as the bloom-backed crawl — the filter
    kind may only change PRUNING, never semantics."""
    from frontier_engine.config import EngineConfig
    from frontier_engine.crawler import run_crawl
    from frontier_engine.fixtures import WorldSpec, generate_world
    from frontier_engine.parse import CrawlArgs

    spec = WorldSpec(n_hosts=2, listings_total=12, max_reviews=40)
    world = generate_world(spec)
    args = CrawlArgs(spec.checkin, spec.checkout, spec.price_max)
    pages = spark.createDataFrame(world["pages"])
    seeds = spark.createDataFrame(world["seeds"][["url"]])

    results = {}
    for kind in ("bloom", "cuckoo"):
        cfg = EngineConfig(
            n_seen_shards=4, bloom_bits_per_shard=1 << 14, salt_partitions=2,
            seen_filter_kind=kind, cuckoo_buckets_per_shard=1 << 10,
        )
        res = run_crawl(
            spark, pages, cfg, args, seeds=seeds, max_rounds=40,
            snapshot_dir=str(tmp_path_factory.mktemp(f"snap-{kind}")),
        )
        batches = sorted(
            (r["round"], r.host, r.url, r["rank"])
            for r in res.outputs["batches"].collect()
        )
        seen = {r.canon_url for r in res.seen_exact.collect()}
        results[kind] = (batches, seen)

    assert results["cuckoo"][0] == results["bloom"][0]
    assert results["cuckoo"][1] == results["bloom"][1]
