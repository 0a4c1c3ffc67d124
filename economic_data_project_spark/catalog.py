"""Table catalog over the synthetic parquet star schema.

Mirrors the reference's "default dataset" resolution (bare table names
resolve against a configured dataset, bigquery_warehouse.py:266-299): here a
scale-factor directory is the dataset and each parquet file is a table.

Design for 100 TB: tables are read lazily via ``spark.read.parquet`` so
Catalyst keeps predicate pushdown and column pruning; nothing is cached or
collected at registration time. Small dimension tables are flagged so
callers can ``broadcast()`` them in joins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
    default; read nanos as long and truncate to microseconds — the same
    ns->us truncation DuckDB applies, so timestamps stay comparable."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(df.schema["ts"].dataType, TimestampNTZType):
        # Newer testdata writes TIMESTAMP_NTZ; session tz is UTC so the
        # cast to TIMESTAMP is wall-clock-identical (and unix_micros /
        # watermarks require the tz-aware type).
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table present in ``sf_dir`` (missing files are skipped)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (the SQL entry point's catalog)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
