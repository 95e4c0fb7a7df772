"""Host link-graph PageRank (linkgraph.py) — analytic cases, the
pure-Python twin as oracle, mass conservation, priority folding, and
the physical-plan shape of one power step."""

import math

import pytest
import pyspark.sql.functions as F

from frontier_engine.linkgraph import (
    apply_host_rank,
    host_edges,
    pagerank,
    pagerank_py,
)
from frontier_engine.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(master="local[4]", shuffle_partitions=4)


def _edges_df(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, weight long")


def _ranks(df):
    return {r.host: r.pagerank for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    """A↔B is symmetric: ranks must be exactly 0.5/0.5 at every
    iteration count."""
    got = _ranks(pagerank(_edges_df(spark, [("a", "b", 1), ("b", "a", 1)]), iters=5))
    assert got == {"a": pytest.approx(0.5), "b": pytest.approx(0.5)}


def test_star_hub_dominates_and_dangling_mass_recycles(spark):
    """N spokes → hub, hub links nowhere: the hub is dangling; its mass
    must recycle uniformly (sum stays 1) and the hub must outrank every
    spoke."""
    triples = [(f"s{i}", "hub", 1) for i in range(8)]
    got = _ranks(pagerank(_edges_df(spark, triples), iters=12))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(got["hub"] > got[f"s{i}"] for i in range(8))
    # spokes are symmetric
    spoke = got["s0"]
    assert all(got[f"s{i}"] == pytest.approx(spoke) for i in range(8))


def test_matches_python_twin_on_weighted_graph(spark):
    """Deterministic irregular weighted graph: the distributed kernel
    must agree with the sequential twin to float precision."""
    triples = []
    hosts = [f"h{i}" for i in range(12)]
    for i, s in enumerate(hosts):
        for j in range(1 + (i * 7) % 3):
            d = hosts[(i * 5 + j * 3 + 1) % 12]
            if d != s:
                triples.append((s, d, 1 + (i + j) % 4))
    want = pagerank_py([(s, d, float(w)) for s, d, w in triples], iters=9)
    got = _ranks(pagerank(_edges_df(spark, triples), iters=9))
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12), h
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_host_edges_aggregates_drops_self_loops_and_seeds(spark):
    cand = spark.createDataFrame(
        [
            ("https://a.example/x", "https://b.example/1"),
            ("https://a.example/y", "https://b.example/2"),
            ("https://a.example/z", "https://a.example/w"),  # self-loop
            ("", "https://c.example/seed"),  # seed
            ("https://b.example/1", "https://c.example/q"),
        ],
        "parent_url string, url string",
    )
    got = {(r.src, r.dst): r.weight for r in host_edges(cand).collect()}
    assert got == {("a.example", "b.example"): 2, ("b.example", "c.example"): 1}


def test_apply_host_rank_boosts_within_depth_only(spark):
    """The normalized boost is ≤ weight (default 10) — it reorders hosts
    within a depth level but can never beat one depth step (100)."""
    ranks = spark.createDataFrame(
        [("big.example", 0.8), ("small.example", 0.1)], "host string, pagerank double"
    )
    pending = spark.createDataFrame(
        [
            ("big.example", "https://big.example/1", 100.0, 1),
            ("small.example", "https://small.example/1", 100.0, 2),
            ("small.example", "https://small.example/deep", 200.0, 3),
        ],
        "host string, url string, priority double, discovered_seq long",
    )
    out = {r.url: r.priority for r in apply_host_rank(pending, ranks).collect()}
    assert out["https://big.example/1"] == pytest.approx(110.0)  # max rank → full boost
    assert out["https://small.example/1"] == pytest.approx(101.25)
    # deeper URL still wins regardless of host rank
    assert out["https://small.example/deep"] > out["https://big.example/1"]
    # unknown host: unchanged
    pending2 = spark.createDataFrame(
        [("nowhere.example", "https://nowhere.example/", 100.0, 1)],
        "host string, url string, priority double, discovered_seq long",
    )
    out2 = apply_host_rank(pending2, ranks).first()
    assert out2.priority == pytest.approx(100.0)


def test_power_step_plan_shuffles_on_graph_keys_only(spark):
    """One power iteration must be join+agg shaped: no CartesianProduct /
    BroadcastNestedLoopJoin, and no single-partition exchange."""
    triples = [(f"h{i}", f"h{(i + 1) % 6}", 1) for i in range(6)]
    out = pagerank(_edges_df(spark, triples), iters=2, checkpoint_every=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "SinglePartition" not in plan


def test_rank_sum_invariant_with_heavy_dangling(spark):
    """Graph where most mass ends on dangling nodes each step."""
    triples = [("a", "d1", 1), ("a", "d2", 1), ("b", "d3", 1)]
    got = _ranks(pagerank(_edges_df(spark, triples), iters=7))
    want = pagerank_py([(s, d, 1.0) for s, d, _ in triples], iters=7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for h, v in want.items():
        assert got[h] == pytest.approx(v, abs=1e-12)
    assert not math.isnan(sum(got.values()))
