"""SparkSession factory with scale-aware defaults.

The reference runs one pandas task at a time under Airflow's
SequentialExecutor (reference: airflow.cfg:45); here a single lazy
SparkSession replaces the whole DAG and the executor tier scales out.
Every config below is chosen for correctness-at-scale first:

- AQE on: runtime coalescing of small shuffle partitions, skew-join
  splitting, and dynamic broadcast — the knobs that keep a fixed plan
  viable when the data is 1000x bigger than the dev sample.
- shuffle.partitions sized to the local core count for tests; on a
  real cluster this would be ~2-3x total executor cores (AQE coalesces
  down, so erring high is safe).
- session timezone pinned to UTC so timestamp semantics are stable
  across driver, executors, and external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# Shuffle-partition override (VERDICT r11 #8). Default: the core count
# — at bench scale (sf0.1, <100 MB of parquet) every shuffle is
# overhead-dominated and AQE coalesces small partitions anyway, so
# tracking cores keeps the driver's c8/c32 scaling runs comparable. On
# a real cluster this should be sized from DATA, not cores: shuffled
# bytes / ~128-256 MB target partition (guide §2.2), e.g.
# SPARK_GRAFT_SHUFFLE_PARTITIONS=4000 for a ~1 TB shuffle. Erring high
# is safe (AQE coalesces down); the constant-per-core default is NOT a
# production setting, just the comparable local one.
DEFAULT_SHUFFLE_PARTITIONS = os.environ.get(
    "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_CPUS
)


def get_spark(app_name: str = "etl_orders_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode for tests; the same config block is what we'd submit to a
    1000-executor cluster minus master/memory (cluster managers own those).
    """
    n = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS if cpus is None else n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark
        # cannot read that into TimestampType — read as long, convert in
        # load_table (sources/readers.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply the runtime-mutable engine defaults to an externally created
    session (e.g. the verification driver's). Only touches confs that are
    settable after startup."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # a default-conf session carries 200 shuffle partitions — far too
    # many tasks for local test scales (AQE coalesces, but task-launch
    # overhead remains); arrow speeds any toPandas the caller does
    spark.conf.set("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
