"""URL-seen set: partitioned bloom shards + exact confirmation table
(SURVEY §2.4 D1/D3, §2.8 SO2 — the core north-rule capability).

The reference keeps an in-memory ``set`` of listing ids
(/root/reference/deepbnb/spiders/airbnb.py:51,169-173) plus the framework's
request-fingerprint dedup — both unbounded driver memory, the scalability
wall (SURVEY §4 X14). The engine's replacement is EXACT at any scale:

* ``seen_shards`` — ``(shard_id int, bits binary)``: one bloom bit-array
  per shard, ``shard_id = pmod(url_hash, n_shards)``. Membership and merge
  run as cogrouped ``applyInPandas`` over shard_id, so each shard's bits
  meet exactly the candidate rows that could hit it — no broadcast of the
  full filter, no driver state. At the 10^10 design point: 10^10 keys ×
  10 bits ≈ 12.5 GB of bits across 1024 shards ≈ 12 MB/shard — one Arrow
  batch per task.
* ``seen_exact`` — ``(url_hash long, canon_url string)``: bloom POSITIVES
  (a tiny fraction: true dups + FPR·new) are confirmed against this table
  with an anti-join; bloom NEGATIVES are definitely-new and skip the join
  entirely. Net semantics = exact set membership; the bloom only prunes
  join traffic, so crawl ordering matches the reference's exact dedup.

Bit indexing uses Kirsch-Mitzenmacher double hashing from the single
64-bit ``xxhash64(canon_url)`` the frontier already carries — no extra
hashing pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHARD_SCHEMA = T.StructType(
    [T.StructField("shard_id", T.IntegerType()), T.StructField("bits", T.BinaryType())]
)

SEEN_EXACT_SCHEMA = T.StructType(
    [T.StructField("url_hash", T.LongType()), T.StructField("canon_url", T.StringType())]
)


def empty_shards(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], SHARD_SCHEMA)


def empty_seen_exact(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], SEEN_EXACT_SCHEMA)


def _bit_positions(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing h1 + i*h2 (mod n_bits)."""
    u = hashes.astype(np.uint64)
    h1 = u % np.uint64(n_bits)
    h2 = (u >> np.uint64(33)) | np.uint64(1)  # odd → full period
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)


def shard_id_col(url_hash, n_shards: int):
    return F.pmod(url_hash, F.lit(n_shards)).cast("int")


def bloom_check(
    candidates: DataFrame,
    shards: DataFrame,
    n_shards: int,
    n_bits: int,
    k: int,
) -> DataFrame:
    """Return *candidates* + boolean ``maybe_seen``.

    Cogrouped per shard: the shard's bit blob and its candidate rows land
    in the same task; membership is a vectorized numpy test. Missing shard
    → definitely unseen.
    """
    cand = candidates.withColumn("shard_id", shard_id_col(F.col("url_hash"), n_shards))
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def check(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:
            return cdf.assign(maybe_seen=pd.Series([], dtype=bool))
        if sdf.empty or sdf["bits"].iloc[0] is None:
            return cdf.assign(maybe_seen=False)
        bits = np.frombuffer(sdf["bits"].iloc[0], dtype=np.uint8)
        pos = _bit_positions(cdf["url_hash"].to_numpy(np.int64), n_bits, k)
        byte_idx = (pos >> 3).astype(np.int64)
        mask = (1 << (pos & 7)).astype(np.uint8)
        hit = ((bits[byte_idx] & mask) == mask).all(axis=1)
        return cdf.assign(maybe_seen=hit)

    return cand.groupBy("shard_id").cogroup(shards.groupBy("shard_id")).applyInPandas(
        check, out_schema
    )


def bloom_positive_hashes(
    hashes: DataFrame, shards: DataFrame, n_shards: int, n_bits: int, k: int
) -> DataFrame:
    """url_hash rows that the bloom reports as maybe-seen. Only the 8-byte
    hash column crosses the Arrow boundary — candidate payloads never
    leave the JVM."""
    keyed = hashes.select("url_hash").withColumn(
        "shard_id", shard_id_col(F.col("url_hash"), n_shards)
    )

    def check(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty or sdf.empty or sdf["bits"].iloc[0] is None:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        bits = np.frombuffer(sdf["bits"].iloc[0], dtype=np.uint8)
        pos = _bit_positions(cdf["url_hash"].to_numpy(np.int64), n_bits, k)
        byte_idx = (pos >> 3).astype(np.int64)
        mask = (1 << (pos & 7)).astype(np.uint8)
        hit = ((bits[byte_idx] & mask) == mask).all(axis=1)
        return pd.DataFrame({"url_hash": cdf["url_hash"].to_numpy(np.int64)[hit]})

    return keyed.groupBy("shard_id").cogroup(shards.groupBy("shard_id")).applyInPandas(
        check, T.StructType([T.StructField("url_hash", T.LongType())])
    )


# broadcast the bloom bits only while they are SMALL: every
# filter_unseen call rebuilds the broadcast (O(bits) Arrow collect to
# the driver + O(bits) broadcast back out), while the cogrouped path
# pays one shuffle of the 8-byte probe hashes plus one pass over the
# blobs. r6, measured on the bench workload: at 64 MB of bits / 1M
# probes the cogroup probe runs ~2x faster end to end (0.6-0.9 s vs
# 1.2-3.3 s incl. the rebuild); at 512 KB of bits the broadcast wins
# (0.3-0.4 s vs 0.4-1.0 s). 8 MB sits a safe margin below the measured
# crossover, and the 10^10 design point (~12.5 GB of bits) was always
# cogroup territory.
BROADCAST_BITS_MAX_BYTES = 8 * 1024 * 1024


def bloom_positive_hashes_broadcast(
    candidates: DataFrame, shards: DataFrame, n_shards: int, n_bits: int, k: int
) -> DataFrame:
    """Broadcast-mode bloom check: shard blobs ride a broadcast variable;
    candidates are tested partition-locally in mapInPandas over ONLY the
    hash column — zero shuffle, scales with input partitions.

    The blobs broadcast as ONE concatenated byte array (shard s occupies
    bytes [s·n_bits/8, (s+1)·n_bits/8)), so membership for a whole Arrow
    batch is a single vectorized gather — no per-shard mask loop, whose
    O(n_shards × batch) row-scans dominated the dedupe stage's Python
    time at 64 shards (round-3 scaling-gate fix). A shard missing from
    *shards* stays all-zeros ⇒ definitely-unseen, same semantics."""
    spark = candidates.sparkSession
    shard_bytes = n_bits // 8
    big = np.zeros(n_shards * shard_bytes, dtype=np.uint8)
    # r6 perf: Arrow transfer for the blobs — .collect() rows moved the
    # multi-MB bit arrays through py4j's pickled-row path (measured ~10x
    # slower for a 64 MB shard set; guide §6 "Arrow for driver transfers")
    blobs = shards.toPandas()
    for sid, blob in zip(blobs["shard_id"], blobs["bits"]):
        if blob is not None:
            big[sid * shard_bytes:(sid + 1) * shard_bytes] = np.frombuffer(
                blob, dtype=np.uint8
            )
    bc = spark.sparkContext.broadcast(big)

    def check(batches):
        bits = bc.value
        for pdf in batches:
            h = pdf["url_hash"].to_numpy(np.int64)
            sid = (h % n_shards).astype(np.int64)  # numpy % matches Spark pmod
            pos = _bit_positions(h, n_bits, k)
            byte_idx = sid[:, None] * shard_bytes + (pos >> 3).astype(np.int64)
            mask = (1 << (pos & 7)).astype(np.uint8)
            hit = ((bits[byte_idx] & mask) == mask).all(axis=1)
            yield pdf[["url_hash"]][hit]

    return candidates.select("url_hash").mapInPandas(
        check, T.StructType([T.StructField("url_hash", T.LongType())])
    )


def filter_unseen(
    candidates: DataFrame,
    shards: DataFrame,
    seen_exact: DataFrame | list[DataFrame],
    n_shards: int,
    n_bits: int,
    k: int,
    filter_kind: str = "bloom",
) -> DataFrame:
    """EXACT unseen subset of *candidates* (columns preserved).

    Bloom positives (true dups + FPR·new) are confirmed against
    seen_exact with a semi-join; candidates are then anti-joined against
    the confirmed-dup hash set (X1: dedupe strictly before fetch). The
    bloom check broadcasts the bit blobs when they fit
    (BROADCAST_BITS_MAX_BYTES) — no shuffle — else runs the cogrouped
    shard path.

    *seen_exact* may be a list of table parts (seen_store.SeenExactStore:
    a bucketBy(url_hash) base + small per-round deltas). Each part gets
    its OWN semi-join so the bucketed base joins exchange-free — a union
    view would erase the bucketing and re-shuffle the 0.9 TB table every
    round (the round-1 scale-killer). The final anti-join's right side is
    bounded by the round's dup count.
    """
    parts = seen_exact if isinstance(seen_exact, list) else [seen_exact]
    if not parts:
        return candidates
    if filter_kind == "cuckoo":
        # north-star fallback structure (supports TTL deletes); for the
        # cuckoo path *n_bits* is the per-shard BUCKET count (×4 slots ×
        # 16-bit fingerprints); same exactness discipline either way
        from frontier_engine.cuckoo import (
            cuckoo_positive_hashes,
            cuckoo_positive_hashes_broadcast,
        )

        if n_shards * n_bits * 8 <= BROADCAST_BITS_MAX_BYTES:
            positives = cuckoo_positive_hashes_broadcast(candidates, shards, n_shards, n_bits)
        else:
            positives = cuckoo_positive_hashes(candidates, shards, n_shards, n_bits)
    elif n_shards * (n_bits // 8) <= BROADCAST_BITS_MAX_BYTES:
        positives = bloom_positive_hashes_broadcast(candidates, shards, n_shards, n_bits, k)
    else:
        positives = bloom_positive_hashes(candidates, shards, n_shards, n_bits, k)
    # bloom+confirm only against the BIG part (the bucketed base — its
    # semi-join moves just the positives); the remaining parts are
    # O(recent-rounds) deltas, cheap to anti-join directly (AQE broadcasts
    # them) — and the Python bloom scan then runs exactly once
    true_dups = positives.join(parts[0].select("url_hash"), "url_hash", "left_semi")
    out = candidates.join(true_dups, "url_hash", "left_anti")
    for part in parts[1:]:
        out = out.join(part.select("url_hash"), "url_hash", "left_anti")
    return out


def update_shards(
    new_urls: DataFrame,
    shards: DataFrame,
    n_shards: int,
    n_bits: int,
    k: int,
    dirty_only: bool = False,
) -> DataFrame:
    """OR the hashes of *new_urls* (url_hash column) into the shard blobs.

    Cogrouped merge — associative + commutative (property-tested), which is
    what makes snapshot/resume sound (SURVEY §7 risks).

    ``dirty_only=True`` emits ONLY shards that received adds (round-3
    commit-bytes fix): untouched blobs are carried forward by manifest
    reference instead of being rewritten every round — at the 10^10
    design point a sparse round's commit drops from ~12 GB (all 1024
    shards) to touched-shards-only.
    """
    adds = new_urls.select("url_hash").withColumn(
        "shard_id", shard_id_col(F.col("url_hash"), n_shards)
    )

    def merge(key, adf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        if dirty_only and adf.empty:
            return pd.DataFrame({"shard_id": pd.Series([], dtype="int32"), "bits": []})
        if not sdf.empty and sdf["bits"].iloc[0] is not None:
            bits = np.frombuffer(sdf["bits"].iloc[0], dtype=np.uint8).copy()
        else:
            bits = np.zeros(n_bits // 8, dtype=np.uint8)
        if not adf.empty:
            pos = _bit_positions(adf["url_hash"].to_numpy(np.int64), n_bits, k)
            byte_idx = (pos >> 3).reshape(-1).astype(np.int64)
            masks = (1 << (pos & 7)).reshape(-1).astype(np.uint8)
            np.bitwise_or.at(bits, byte_idx, masks)
        return pd.DataFrame({"shard_id": [sid], "bits": [bits.tobytes()]})

    return adds.groupBy("shard_id").cogroup(shards.groupBy("shard_id")).applyInPandas(
        merge, SHARD_SCHEMA
    )


def resolve_shards(
    spark: SparkSession,
    base_path: str | None,
    delta_paths: list[str],
    extra_df: DataFrame | None = None,
) -> DataFrame:
    """Merge-on-read view over a shard-blob LSM: the base dir plus
    per-round dirty-shard delta dirs, LATEST version of each shard_id
    winning. ``extra_df`` (optional) joins the chain as the NEWEST
    version — the compaction path folds a not-yet-written dirty frame
    this way. Row count is O(n_shards × chain length) with the blob as
    payload, and the one exchange (by shard_id) is the same partitioning
    every consumer of the shards needs anyway."""
    from pyspark.sql import Window

    frames = []
    if base_path:
        frames.append(spark.read.parquet(base_path).withColumn("_v", F.lit(0)))
    for i, p in enumerate(delta_paths):
        frames.append(spark.read.parquet(p).withColumn("_v", F.lit(i + 1)))
    if extra_df is not None:
        frames.append(extra_df.withColumn("_v", F.lit(len(delta_paths) + 1)))
    if not frames:
        return empty_shards(spark)
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    w = Window.partitionBy("shard_id").orderBy(F.desc("_v"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_v")
    )


def update_seen(
    new_urls: DataFrame,
    shards: DataFrame,
    seen_exact: DataFrame,
    n_shards: int,
    n_bits: int,
    k: int,
) -> tuple[DataFrame, DataFrame]:
    """Add (url_hash, canon_url) rows of *new_urls* to both structures.

    One-shot/seeding convenience ONLY — the union+dropDuplicates here
    re-shuffles the whole exact table, so the crawler's per-round path
    uses seen_store.SeenExactStore (bucketed base + O(batch) deltas)
    instead."""
    new_shards = update_shards(new_urls, shards, n_shards, n_bits, k)
    new_exact = seen_exact.unionByName(
        new_urls.select("url_hash", "canon_url")
    ).dropDuplicates(["url_hash"])
    return new_shards, new_exact
