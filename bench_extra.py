#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query noop-sink timing +
explain("formatted") capture, SEPARATE from the frozen bench.py.

Usage:
    python bench_extra.py queries [name ...]      # time headline queries
    python bench_extra.py plans  [name ...]       # dump plans to plans/r06/
    python bench_extra.py sched                   # staged schedule_round
    python bench_extra.py ingest                  # staged ingest round

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), BENCH_REPS
(default 2 — first run includes codegen/JIT warmup, report both).
"""
from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_REPS", "2"))

HEADLINE = [
    "frontier_rank", "frontier_dedup", "robots_filter", "fetch_join_missing",
    "price_parse", "reviews_offsets", "pricing_summary", "cache_join",
    "topk_per_group", "events_windows", "dedup_exact", "text_metrics",
    "minhash_dedup", "simhash_pairs", "ann_topk", "seen_bloom",
    "duplicate_spans", "ttl_recrawl", "ivf_topk_join", "minhash_dedup_join",
    "stratified_sample", "export_grid", "semantic_dedup", "media_near_dup",
    "pii_clean", "pack_sequences", "trap_filter", "link_extract",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _spark():
    from frontier_engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    return get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                     shuffle_partitions=max(CPUS, 32))


def time_queries(names):
    import __spark_entry__ as E

    spark = _spark()
    qs = E.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"q:{name}")
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 2))
        out[name] = samples
        print(f"{name}: {samples}", flush=True)
    print("QUERY_TIMES " + json.dumps(out))
    spark.stop()


def dump_plans(names, suffix="before"):
    import __spark_entry__ as E

    spark = _spark()
    qs = E.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(p)
        n_ex = p.count("Exchange")
        print(f"{name}: {len(p)} chars, Exchange x{n_ex}, "
              f"BatchEvalPython x{p.count('BatchEvalPython')}, "
              f"ArrowEval x{p.count('ArrowEvalPython')}", flush=True)
    spark.stop()


def sched_round():
    import bench

    spark = _spark()
    r = bench.schedule_round(spark, int(os.environ.get("BENCH_FRONTIER_N", 1_000_000)))
    print("SCHED " + json.dumps(r))
    spark.stop()


def ingest_round():
    import bench

    spark = _spark()
    pages = bench._parse_world_pages(spark).cache()
    pages.count()
    r = bench.ingest_round_bench(spark, SF_DIR, pages)
    print("INGEST " + json.dumps(r))
    spark.stop()


def parse_bench():
    import bench

    spark = _spark()
    for _ in range(REPS):
        r = bench.parse_pages_bench(spark)
        print("PARSE " + json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if mode == "queries":
        time_queries(rest or HEADLINE)
    elif mode == "plans":
        suffix = "before"
        if rest and rest[0] in ("before", "after"):
            suffix, rest = rest[0], rest[1:]
        dump_plans(rest or HEADLINE, suffix)
    elif mode == "sched":
        sched_round()
    elif mode == "ingest":
        ingest_round()
    elif mode == "parse":
        parse_bench()
