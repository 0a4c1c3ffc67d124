"""A reference-shaped model chain run through the DAG executor.

Mirrors the staging -> mart -> signal layering of the reference's dbt
project (technical_price_universe -> technical_indicator_daily ->
technical_signals chain, SURVEY.md §7 step 5) on the synthetic star
schema, and registers the terminal model as an oracle-checked query so
the executor itself sits inside the correctness surface.

All three layers are view-materialized: Catalyst inlines the whole chain
into ONE plan, so the lineitem scan happens once with the staging filter
pushed into parquet — the fusion dbt cannot do across models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import query
from .dag import ModelGraph

DEC = "decimal(28,6)"

GRAPH = ModelGraph()


@GRAPH.model("stg_lineitem")
def stg_lineitem(spark: SparkSession) -> DataFrame:
    """Staging: typed projection + validity filters
    (stg_major_indices.sql shape)."""
    li = spark.table("__src_lineitem")
    return li.where(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.to_date("l_shipdate").alias("d"),
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )


@GRAPH.model("mart_daily_flag", deps=("stg_lineitem",))
def mart_daily_flag(spark: SparkSession) -> DataFrame:
    """Mart: daily per-flag aggregate (technical_price_universe grain)."""
    return (
        spark.table("stg_lineitem")
        .groupBy("flag", "d")
        .agg(
            (F.sum(F.col("rev").cast(DEC)).cast("double") / F.lit(1e6))
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@GRAPH.model("signal_flag_momentum", deps=("mart_daily_flag",))
def signal_flag_momentum(spark: SparkSession) -> DataFrame:
    """Signal: 20-day SMA cross state (technical_signals shape)."""
    w20 = Window.partitionBy("flag").orderBy("d").rowsBetween(-19, 0)
    m = spark.table("mart_daily_flag")
    sma = (
        F.sum(F.col("revenue").cast(DEC)).over(w20).cast("double")
        / F.count("revenue").over(w20)
    )
    return m.select(
        "flag",
        "d",
        "revenue",
        "n_items",
        sma.alias("sma20"),
        F.when(F.col("revenue") > sma, "above")
        .otherwise("not_above")
        .alias("sma_state"),
    )


_DAG_ORACLE = """
WITH stg AS (
  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
         (l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  WHERE l_quantity > 0 AND l_extendedprice > 0
),
mart AS (
  SELECT flag, d,
         CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE) / 1e6 AS revenue,
         COUNT(*) AS n_items
  FROM stg GROUP BY flag, d
)
SELECT flag, d, revenue, n_items,
  (CAST(SUM(CAST(revenue AS DECIMAL(28,6))) OVER w AS DOUBLE)
     / COUNT(revenue) OVER w) AS sma20,
  (CASE WHEN revenue > CAST(SUM(CAST(revenue AS DECIMAL(28,6))) OVER w
                            AS DOUBLE) / COUNT(revenue) OVER w
        THEN 'above' ELSE 'not_above' END) AS sma_state
FROM mart
WINDOW w AS (PARTITION BY flag ORDER BY d
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
ORDER BY flag, d
"""


@query("dag_model_chain", oracle=_DAG_ORACLE)
def dag_model_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__src_lineitem"
    )
    out = GRAPH.run(spark, targets=["signal_flag_momentum"])
    return out["signal_flag_momentum"].orderBy("flag", "d")
