"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the config choices below are the ones that
matter on a real cluster too: AQE (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for any pandas exchange, and a shuffle-partition
count sized for the local fixture scale (override via env/builder for bigger
deployments).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(app_name: str = "graphdb_free_mocha_sa_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime join-strategy switches, skew-join splitting, partition coalescing.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # Prefer hash joins over sort-merge when a side fits per-partition
        # memory (optimization guide §3.1/§9): the dictionary decode joins
        # and mid-size equi-joins skip both sorts; AQE's localMapThreshold
        # bounds the build side (64 MB/partition) so the SHJ can't OOM.
        # Scale-parameterised via env — not a local-core-count tune; the
        # same preference applies on a cluster.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_THRESHOLD", "64m"))
        # Arrow for pandas_udf / applyInPandas exchange (vectorized, not per-row pickle).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in fixtures are naive; keep session TZ stable for determinism.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # fixture events.parquet stores TIMESTAMP(NANOS); read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Silence WindowExec's "No Partition Defined" WARN: every remaining
    # unpartitioned window in this engine is a DOCUMENTED tiny frame (the
    # #blocks/#buckets offset tables of the packing prefix sums, match-set
    # ranking) — constant partition keys don't help because Catalyst folds
    # them. Real unpartitioned-window smells are guarded where they are
    # enforceable: tests/test_plans.py counts Window nodes with an empty
    # partition spec in the packing/batching plans and fails on growth.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:  # noqa: BLE001 — logging backend variance is cosmetic
        pass
    return spark
