"""SparkSession factory.

The reference delegates execution to BigQuery/DuckDB; here Catalyst+Tungsten
is the engine, so session-level tuning is where warehouse defaults live:

- AQE on (runtime coalesce + skew-join handling — replaces the warehouse's
  opaque adaptive execution).
- Arrow on (fast pandas interchange for the ``applyInPandas`` signal kernels,
  mirroring the reference's Arrow->Polars boundary at
  bigquery_warehouse.py:284-299).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  correctness oracle.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster this should be ~2-3x total executor cores (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "economic-data-project-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session with warehouse-grade defaults."""
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(env_cpus) if env_cpus else 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally provided session.

    The correctness driver hands us its own SparkSession; only
    runtime-mutable confs can be set here (timezone matters most: the
    DuckDB oracle treats timestamps as UTC-naive).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # non-mutable in some deployments; defaults are acceptable
    return spark
