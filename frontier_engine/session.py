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
        # runtime (exact-size) broadcast decisions: the dedupe anti-join's
        # build side is the round's confirmed-dup hash set — bounded by the
        # round's candidates (8 B/key ⇒ ~10^7 keys ≈ 80 MB), NOT by the
        # frontier. Letting AQE broadcast it avoids re-shuffling the full
        # candidate set every round; oversize rounds fall back to SMJ
        # automatically. Static stats stay at the conservative default.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")
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
