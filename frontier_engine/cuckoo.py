"""Cuckoo-filter shards — the north star's fallback membership structure
for the URL-seen set (alternative to the bloom shards in seen.py).

Why a cuckoo filter at all (Fan et al., CoNEXT 2014): same
few-bits-per-key membership as a bloom, plus DELETE support — which a
long-lived crawl wants for recrawl/TTL policies (expire a url_hash from
the seen set without rebuilding the filter). Exactness discipline is
identical to the bloom path: the filter only PRUNES the exact-confirm
join; positives are confirmed against ``seen_exact``, so false positives
never change semantics, and inserted keys are never false negatives.

Layout per shard: a ``uint16`` numpy array of shape (n_buckets, 4)
serialized to bytes — 4 fingerprint slots per bucket, fingerprint 0 means
empty (real fingerprints are forced nonzero). Candidate buckets follow
the partial-key cuckoo rule::

    fp  = nonzero 16 bits of the key
    b1  = h mod n_buckets
    b2  = (b1 XOR spread(fp)) mod n_buckets     -- self-inverse

``n_buckets`` MUST be a power of two: the XOR-then-mod alternate-bucket
rule is only self-inverse when the mod acts as a bitmask (alt(alt(b)) ==
b); a non-power-of-two table would relocate evicted fingerprints to
buckets ``contains`` never probes — silent false negatives. Validated at
every entry point.

Deletion discipline (standard cuckoo-filter rule, Fan et al. §3.2): the
table is a MULTISET of fingerprint copies — ``insert`` always adds a
slot copy, even when an equal fingerprint is already present, so two
different keys that collide on (bucket, fingerprint) hold two copies and
``delete`` of one key removes exactly one copy, leaving the other key's
membership intact. The crawler only ever inserts unseen-filtered keys,
so duplicate copies arise only from genuine collisions, keeping load
overhead negligible.

So eviction needs only (slot value, current bucket). At 4 slots/bucket
the filter holds ~95% load; inserts that still fail after the eviction
walk go to a per-shard stash (kept in the blob tail) — membership stays
false-negative-free at any load.

Spark integration mirrors seen.py: blobs broadcast when they fit, else
cogrouped by ``shard_id = pmod(url_hash, n_shards)``; only the 8-byte
hash column ever crosses the Arrow boundary.
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
STASH_MAX = 64
_EVICT_LIMIT = 500


def _check_buckets(n_buckets: int) -> None:
    if n_buckets <= 0 or n_buckets & (n_buckets - 1):
        raise ValueError(
            f"cuckoo n_buckets must be a power of two (got {n_buckets}): "
            "the XOR alternate-bucket rule is only self-inverse under a "
            "bitmask mod — round up to the next power of two"
        )


def _fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _alt_bucket(b: np.ndarray | int, fp: np.ndarray | int, n_buckets: int):
    """Partial-key cuckoo alternate bucket: XOR with a fingerprint spread
    (odd-constant multiply) — self-inverse, so eviction needs only the
    slot value and its current bucket."""
    return (b ^ (fp * 0x5BD1E995)) % n_buckets


def empty_filter(n_buckets: int) -> bytes:
    """Serialized empty shard: table || stash (stash fixed-size, fp=0 empty)."""
    _check_buckets(n_buckets)
    table = np.zeros(n_buckets * SLOTS, dtype=np.uint16)
    stash = np.zeros(STASH_MAX, dtype=np.uint16)
    return table.tobytes() + stash.tobytes()


def _load(blob: bytes, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    arr = np.frombuffer(blob, dtype=np.uint16).copy()
    return arr[: n_buckets * SLOTS].reshape(n_buckets, SLOTS), arr[n_buckets * SLOTS:]


def _dump(table: np.ndarray, stash: np.ndarray) -> bytes:
    return table.reshape(-1).tobytes() + stash.tobytes()


def insert(blob: bytes, hashes: np.ndarray, n_buckets: int) -> bytes:
    """Insert keys; returns the new blob. Vectorized first-try placement
    into b1/b2; the (rare) leftovers run the sequential eviction walk.
    Always stores one slot copy PER KEY (multiset — see module docstring:
    collision-safe deletes require it; the caller inserts only unseen
    keys, so copies arise only from genuine (bucket, fp) collisions).
    Raises only if the stash also overflows — size shards so load ≤ 0.9."""
    _check_buckets(n_buckets)
    table, stash = _load(blob, n_buckets)
    h = hashes.astype(np.uint64)
    fp = _fingerprint(h)
    b1 = (h % np.uint64(n_buckets)).astype(np.int64)
    b2 = _alt_bucket(b1, fp.astype(np.int64), n_buckets)

    pending = list(zip(fp.tolist(), b1.tolist(), b2.tolist()))
    rng_state = 0x9E3779B97F4A7C15
    for fpi, x1, x2 in pending:
        placed = False
        for b in (x1, x2):
            row = table[b]
            empty = np.where(row == 0)[0]
            if empty.size:
                table[b, empty[0]] = fpi
                placed = True
                break
        if placed:
            continue
        # eviction walk
        cur_fp, cur_b = fpi, x1
        for _ in range(_EVICT_LIMIT):
            rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            slot = rng_state % SLOTS
            cur_fp, table[cur_b, slot] = int(table[cur_b, slot]), cur_fp
            cur_b = int(_alt_bucket(cur_b, cur_fp, n_buckets))
            row = table[cur_b]
            empty = np.where(row == 0)[0]
            if empty.size:
                table[cur_b, empty[0]] = cur_fp
                cur_fp = 0
                break
        if cur_fp:
            free = np.where(stash == 0)[0]
            if not free.size:
                raise OverflowError("cuckoo shard full (stash exhausted) — grow n_buckets")
            stash[free[0]] = cur_fp
    return _dump(table, stash)


def contains(blob: bytes, hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized membership (no false negatives for inserted keys)."""
    _check_buckets(n_buckets)
    table, stash = _load(blob, n_buckets)
    h = hashes.astype(np.uint64)
    fp = _fingerprint(h)
    b1 = (h % np.uint64(n_buckets)).astype(np.int64)
    b2 = _alt_bucket(b1, fp.astype(np.int64), n_buckets)
    hit = (table[b1] == fp[:, None]).any(axis=1) | (table[b2] == fp[:, None]).any(axis=1)
    if (stash != 0).any():
        hit |= np.isin(fp, stash[stash != 0])
    return hit


def delete(blob: bytes, hashes: np.ndarray, n_buckets: int) -> bytes:
    """Remove ONE slot copy per matching fingerprint (TTL/recrawl expiry).
    Because ``insert`` keeps one copy per inserted key, deleting key A
    leaves a colliding key B's copy in place — no false negatives for
    still-live keys. Deleting a never-inserted key may clear a colliding
    copy, which is why the crawler's expire path only deletes keys it
    confirmed in ``seen_exact``; even then the filter only prunes the
    exact-confirm join, so semantics never change."""
    _check_buckets(n_buckets)
    table, stash = _load(blob, n_buckets)
    h = hashes.astype(np.uint64)
    fp = _fingerprint(h)
    b1 = (h % np.uint64(n_buckets)).astype(np.int64)
    b2 = _alt_bucket(b1, fp.astype(np.int64), n_buckets)
    for fpi, x1, x2 in zip(fp.tolist(), b1.tolist(), b2.tolist()):
        done = False
        for b in (x1, x2):
            idx = np.where(table[b] == fpi)[0]
            if idx.size:
                table[b, idx[0]] = 0
                done = True
                break
        if not done:
            idx = np.where(stash == fpi)[0]
            if idx.size:
                stash[idx[0]] = 0
    return _dump(table, stash)


# --------------------------------------------------------------------------
# Spark wrappers (mirror seen.bloom_positive_hashes_broadcast)
# --------------------------------------------------------------------------

def cuckoo_positive_hashes_broadcast(candidates, shards, n_shards: int, n_buckets: int):
    """url_hash rows the cuckoo shards report as maybe-seen. *shards* is a
    (shard_id, bits) DataFrame of cuckoo blobs; blobs broadcast, the check
    runs partition-locally over ONLY the hash column."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = candidates.sparkSession
    # Arrow transfer (r6 — see seen.bloom_positive_hashes_broadcast)
    pdf_blobs = shards.toPandas()
    blobs = {
        int(s): bytes(b)
        for s, b in zip(pdf_blobs["shard_id"], pdf_blobs["bits"])
        if b is not None
    }
    bc = spark.sparkContext.broadcast(blobs)

    def check(batches):
        for pdf in batches:
            h = pdf["url_hash"].to_numpy(np.int64)
            sid = h % n_shards
            hit = np.zeros(len(h), dtype=bool)
            for s in np.unique(sid):
                blob = bc.value.get(int(s))
                if blob is None:
                    continue
                m = sid == s
                hit[m] = contains(blob, h[m], n_buckets)
            yield pdf[["url_hash"]][hit]

    return candidates.select("url_hash").mapInPandas(
        check, T.StructType([T.StructField("url_hash", T.LongType())])
    )


def cuckoo_positive_hashes(hashes_df, shards, n_shards: int, n_buckets: int):
    """Cogrouped (non-broadcast) cuckoo check — the 10^10-scale path where
    the shard blobs don't fit a broadcast: each shard's blob meets exactly
    the candidate hashes that could hit it, mirroring
    seen.bloom_positive_hashes."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from frontier_engine.seen import shard_id_col

    keyed = hashes_df.select("url_hash").withColumn(
        "shard_id", shard_id_col(F.col("url_hash"), n_shards)
    )

    def check(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty or sdf.empty or sdf["bits"].iloc[0] is None:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        h = cdf["url_hash"].to_numpy(np.int64)
        hit = contains(bytes(sdf["bits"].iloc[0]), h, n_buckets)
        return pd.DataFrame({"url_hash": h[hit]})

    return keyed.groupBy("shard_id").cogroup(shards.groupBy("shard_id")).applyInPandas(
        check, T.StructType([T.StructField("url_hash", T.LongType())])
    )


def delete_cuckoo_shards(expired, shards, n_shards: int, n_buckets: int):
    """Remove expired url_hash keys from their cuckoo shard blobs (TTL
    recrawl — the operation blooms can't do). Cogrouped like the insert
    path; a shard with no expirations passes through untouched."""
    import pandas as pd
    from pyspark.sql import functions as F

    from frontier_engine.seen import SHARD_SCHEMA, shard_id_col

    # Multiset discipline: insert adds ONE slot copy per distinct key, so
    # delete must remove at most one copy per key per expire batch — a
    # duplicated url_hash in `expired` would otherwise pop two copies and
    # can clear a colliding live key's slot (ADVICE r3).
    dels = expired.select("url_hash").dropDuplicates(["url_hash"]).withColumn(
        "shard_id", shard_id_col(F.col("url_hash"), n_shards)
    )

    def merge(key, ddf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        if sdf.empty or sdf["bits"].iloc[0] is None:
            return pd.DataFrame({"shard_id": [], "bits": []}).astype(
                {"shard_id": "int32"}
            )
        blob = bytes(sdf["bits"].iloc[0])
        if not ddf.empty:
            blob = delete(blob, ddf["url_hash"].to_numpy(np.int64), n_buckets)
        return pd.DataFrame({"shard_id": [sid], "bits": [blob]})

    return dels.groupBy("shard_id").cogroup(shards.groupBy("shard_id")).applyInPandas(
        merge, SHARD_SCHEMA
    )


def update_cuckoo_shards(new_urls, shards, n_shards: int, n_buckets: int,
                         dirty_only: bool = False):
    """Insert new url_hash keys into their cuckoo shard blobs (cogrouped
    merge, same discipline as seen.update_shards — including the
    ``dirty_only`` emit-touched-shards-only commit mode)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from frontier_engine.seen import SHARD_SCHEMA, shard_id_col

    adds = new_urls.select("url_hash").withColumn(
        "shard_id", shard_id_col(F.col("url_hash"), n_shards)
    )

    def merge(key, adf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        if dirty_only and adf.empty:
            return pd.DataFrame({"shard_id": pd.Series([], dtype="int32"), "bits": []})
        blob = (
            bytes(sdf["bits"].iloc[0])
            if not sdf.empty and sdf["bits"].iloc[0] is not None
            else empty_filter(n_buckets)
        )
        if not adf.empty:
            blob = insert(blob, adf["url_hash"].to_numpy(np.int64), n_buckets)
        return pd.DataFrame({"shard_id": [sid], "bits": [blob]})

    return adds.groupBy("shard_id").cogroup(shards.groupBy("shard_id")).applyInPandas(
        merge, SHARD_SCHEMA
    )
