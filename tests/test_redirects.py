"""Redirect-chain resolution (redirects.py) — golden chain/loop shapes,
the max_hops boundary, conflict determinism, a pure-Python twin over a
randomized functional graph, and the physical-plan shape (hash joins
only, no cartesian, bounded rounds)."""

import random

import pytest
import pyspark.sql.functions as F

from frontier_engine.redirects import resolve_redirects
from frontier_engine.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(master="local[4]", shuffle_partitions=4)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src_url string, dst_url string")


def _rows(df):
    return {r.url: (r.out_url, r.n_hops, r.resolved) for r in df.collect()}


def resolve_py(pairs, max_hops=16):
    """Independent twin: follow min-dst functional map until terminal or
    max_hops steps."""
    nxt = {}
    for s, d in pairs:
        nxt[s] = min(d, nxt.get(s, d))
    out = {}
    for s in nxt:
        cur, hops = s, 0
        while hops < max_hops and cur in nxt:
            cur = nxt[cur]
            hops += 1
        out[s] = (cur, hops, cur not in nxt)
    return out


def test_simple_chain(spark):
    got = _rows(resolve_redirects(_edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])))
    assert got == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
    }


def test_self_loop_and_two_cycle_unresolved_deterministic(spark):
    got = _rows(
        resolve_redirects(_edges_df(spark, [("s", "s"), ("p", "q"), ("q", "p")]))
    )
    # self-loop: 16 steps land on itself; 2-cycle: 16 (even) steps land
    # back on the start — deterministic, never an infinite loop
    assert got["s"] == ("s", 16, False)
    assert got["p"] == ("p", 16, False)
    assert got["q"] == ("q", 16, False)


def test_max_hops_boundary_exact_and_over(spark):
    chain17 = [(f"n{i}", f"n{i + 1}") for i in range(17)]  # n0 → … → n17
    got = _rows(resolve_redirects(_edges_df(spark, chain17)))
    # n1 is 16 hops from the terminal n17: resolves exactly at the cap
    assert got["n1"] == ("n17", 16, True)
    # n0 is 17 hops out: capped at the node 16 steps in, unresolved
    assert got["n0"] == ("n16", 16, False)


def test_conflicting_targets_resolve_to_min(spark):
    got = _rows(
        resolve_redirects(
            _edges_df(spark, [("a", "z"), ("a", "b"), ("a", "b"), ("b", "c")])
        )
    )
    assert got["a"] == ("c", 2, True)


def test_max_hops_must_be_power_of_two(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges_df(spark, [("a", "b")]), max_hops=10)


def test_random_functional_graph_matches_python_twin(spark):
    rng = random.Random(1234)
    nodes = [f"u{i}" for i in range(400)]
    pairs = []
    for i, s in enumerate(nodes):
        if rng.random() < 0.85:
            # mostly-descending targets make long chains; some forward
            # edges create cycles through the descent
            j = rng.randrange(0, len(nodes))
            pairs.append((s, nodes[j]))
        if rng.random() < 0.1:  # duplicate/conflicting observations
            pairs.append((s, nodes[rng.randrange(0, len(nodes))]))
    want = resolve_py(pairs)
    got = _rows(resolve_redirects(_edges_df(spark, pairs)))
    assert got == want


def test_plan_no_cartesian_and_bounded_joins(spark):
    df = resolve_redirects(
        _edges_df(spark, [(f"c{i}", f"c{i + 1}") for i in range(40)])
    )
    # the result is checkpointed (iterative lineage truncated): the
    # *final* plan must be a scan, and the work plans ran as hash joins.
    # Exercise the guard on a fresh un-checkpointed round instead:
    edges = _edges_df(spark, [(f"c{i}", f"c{i + 1}") for i in range(40)])
    m = edges.groupBy("src_url").agg(F.min("dst_url").alias("cur"))
    hop = m.select(F.col("src_url").alias("_u"), F.col("cur").alias("_c"))
    one_round = m.join(hop, m["cur"] == hop["_u"], "left")
    plan = one_round._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert df.count() == 40
