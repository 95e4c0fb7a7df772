"""SparkSession factory with the engine's scale-oriented defaults.

Single place where execution-relevant conf lives so tests, bench, and the
driver entry all run the same plan shapes:

* AQE on (runtime re-plan, skew-join splitting, small-shuffle coalescing)
* Arrow on (all Python UDFs here are pandas UDFs / mapInPandas)
* shuffle partitions sized for the local harness; a real cluster submit
  overrides via ``--conf`` (this module reads env, no code change needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "frontier-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    shuffle = str(
        shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        or "32"
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast thresholds stay at the defaults (AQE runtime-sizes
        # them). Measured, not assumed: raising the adaptive threshold to
        # 128m so the dedupe anti-join's multi-MB dup-hash set broadcasts
        # was ~5% SLOWER at both 2 and 8 cores than the shuffled hash
        # join (the driver-side HashedRelation build for millions of keys
        # is serial and GC-noisy), with equal scaling efficiency. Bounded
        # small sides (politeness-bounded fetch batches, dims, deltas)
        # still broadcast under the default threshold.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
