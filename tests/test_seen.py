"""D1/SO2: bloom shards — no false negatives, exactness with confirm
table, merge commutativity (SURVEY §5.5)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from frontier_engine import seen as S

N_SHARDS, N_BITS, K = 4, 1 << 14, 7


def _cand_df(spark, hashes):
    pdf = pd.DataFrame({"url_hash": pd.Series(hashes, dtype="int64")})
    pdf["canon_url"] = pdf["url_hash"].map(lambda h: f"u://{h}")
    return spark.createDataFrame(pdf)


def test_no_false_negatives_and_exactness(spark):
    inserted = [(i * 2654435761) % (1 << 63) - (1 << 62) for i in range(500)]
    others = [i * 7 + 3 for i in range(1, 400)]
    others = [o for o in others if o not in set(inserted)]

    shards = S.empty_shards(spark)
    exact = S.empty_seen_exact(spark)
    shards, exact = S.update_seen(_cand_df(spark, inserted), shards, exact, N_SHARDS, N_BITS, K)
    shards = shards.cache()
    exact = exact.cache()

    # membership over inserted ∪ others
    probe = _cand_df(spark, inserted + others)
    unseen = S.filter_unseen(probe, shards, exact, N_SHARDS, N_BITS, K)
    got = sorted(r.url_hash for r in unseen.collect())
    assert got == sorted(others), "exact semantics: all others new, no inserted leak through"

    checked = S.bloom_check(probe, shards, N_SHARDS, N_BITS, K)
    fn = checked.where(~F.col("maybe_seen")).join(
        _cand_df(spark, inserted).select("url_hash"), "url_hash", "inner"
    )
    assert fn.count() == 0, "bloom must never report an inserted key as unseen"


def test_merge_commutative(spark):
    a = _cand_df(spark, [1, 2, 3, 1 << 40])
    b = _cand_df(spark, [5, 6, -7])
    empty_s, empty_e = S.empty_shards(spark), S.empty_seen_exact(spark)

    s_ab, _ = S.update_seen(b, *S.update_seen(a, empty_s, empty_e, N_SHARDS, N_BITS, K), N_SHARDS, N_BITS, K)
    s_ba, _ = S.update_seen(a, *S.update_seen(b, empty_s, empty_e, N_SHARDS, N_BITS, K), N_SHARDS, N_BITS, K)
    ab = {r.shard_id: bytes(r.bits) for r in s_ab.collect()}
    ba = {r.shard_id: bytes(r.bits) for r in s_ba.collect()}
    assert ab == ba


@settings(max_examples=20, deadline=None)
@given(st.sets(st.integers(min_value=-(1 << 62), max_value=1 << 62), min_size=1, max_size=50))
def test_bit_positions_in_range(hashes):
    import numpy as np

    from frontier_engine.seen import _bit_positions

    pos = _bit_positions(np.array(sorted(hashes), dtype=np.int64), N_BITS, K)
    assert pos.shape == (len(hashes), K)
    assert (pos < N_BITS).all() and (pos >= 0).all()
