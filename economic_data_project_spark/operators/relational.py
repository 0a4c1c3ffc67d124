"""Core scan/filter/project/aggregate queries (SURVEY.md §2.1, §2.2, §7.2).

Each query mirrors an operator shape from the reference's dbt models,
re-expressed on the driver's synthetic star schema. Filters and projections
are written declaratively so Catalyst pushes them into the parquet scan
(verify with ``.explain``: PushedFilters + pruned ReadSchema) — at 100 TB
the scan is the dominant cost and pushdown is the difference between
reading a column chunk and reading the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, spread_scan
from ..functions.parity import (
    centered_stddev_samp,
    davg,
    dsum,
    sql_centered_stddev_samp,
    sql_davg,
    sql_dsum,
)
from ..registry import query

# Pinned "as of" date for CURRENT_DATE-relative logic — the reference's
# models are CURRENT_DATE-relative (fred_series_grain.sql:3-4); tests pin
# "today" for reproducibility (SURVEY.md §2.12 hard parts).
AS_OF = "2001-09-02"


# --------------------------------------------------------------------------
# Flagship: pricing summary report.
# Shape: filter -> hash groupBy -> 8 aggregates -> sort. The Spark analogue
# of the reference's market-summary aggregate battery
# (dbt_project/macros/calculate_market_summary.sql:96-132).
# --------------------------------------------------------------------------

_PRICING_SUMMARY_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity")} AS sum_qty,
  {sql_dsum("l_extendedprice")} AS sum_base_price,
  {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {sql_davg("l_quantity")} AS avg_qty,
  {sql_davg("l_extendedprice")} AS avg_price,
  {sql_davg("l_discount")} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '{AS_OF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", oracle=_PRICING_SUMMARY_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # r16 (guide §2.5, VERDICT r15 #2): the battery pays FIVE
    # double->decimal(28,6) casts + exact-decimal partial sums per row
    # (measured ~5x the scan+double-agg cost), and a byte-small
    # one-row-group parquet file serializes all of it on one scan task.
    # spread_scan moves the cast+partial-agg work onto the cluster
    # (pruned columns only cross the exchange — Catalyst pushes the
    # projection below the repartition) and no-ops at scale where file
    # count already provides scan parallelism. Keyed on
    # (l_extendedprice, l_shipdate): near-unique (583k/600k distinct
    # prices at sf0.1) so the hash spreads evenly and stays
    # deterministic under retry, and both columns are already in the
    # pruned ReadSchema — keying on l_orderkey would widen the scan by
    # a column the query never reads (plan-gated:
    # test_pricing_summary_prunes_columns). Exact decimal sums are
    # associative, so the regrouping cannot change any result bit.
    # Measured (alternating A/B, 7 reps, noop sink): 2.16s -> 1.36s.
    return (
        spread_scan(
            li.where(F.to_date("l_shipdate") <= F.lit(AS_OF)),
            "l_extendedprice",
            "l_shipdate",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Projection + rename + cast + LIKE/range predicates — the staging-layer
# shape (stg_major_indices.sql:1-21, stg_reddit_posts.sql:26-46).
# --------------------------------------------------------------------------

_STAGING_PROJECTION_ORACLE = """
SELECT
  o_orderkey AS order_key,
  o_custkey AS customer_key,
  CAST(o_orderdate AS DATE) AS order_date,
  UPPER(o_orderstatus) AS status,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price_dec,
  CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
       THEN 'high' ELSE 'normal' END AS priority_class
FROM orders
WHERE o_totalprice > 1000.0
  AND o_orderstatus IN ('O', 'F')
  AND o_orderpriority NOT LIKE '4-%'
ORDER BY order_key
"""


@query("staging_projection", oracle=_STAGING_PROJECTION_ORACLE)
def staging_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection/rename/cast with pushed-down predicates."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(
            (F.col("o_totalprice") > 1000.0)
            & F.col("o_orderstatus").isin("O", "F")
            & ~F.col("o_orderpriority").like("4-%")
        )
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("customer_key"),
            F.to_date("o_orderdate").alias("order_date"),
            F.upper("o_orderstatus").alias("status"),
            F.col("o_totalprice")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_price_dec"),
            F.when(
                F.col("o_orderpriority").like("1-%")
                | F.col("o_orderpriority").like("2-%"),
                "high",
            )
            .otherwise("normal")
            .alias("priority_class"),
        )
        .orderBy("order_key")
    )


# --------------------------------------------------------------------------
# QUALIFY-style latest-row dedup (18 uses in the reference;
# technical_price_universe.sql:79-82). Spark rewrite: row_number + filter.
# --------------------------------------------------------------------------

_LATEST_ORDER_ORACLE = """
SELECT o_custkey AS customer_key,
       o_orderkey AS latest_order_key,
       CAST(o_orderdate AS DATE) AS latest_order_date,
       o_totalprice AS latest_total_price
FROM orders
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY o_custkey
    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
ORDER BY customer_key
"""


@query("latest_order_per_customer", oracle=_LATEST_ORDER_ORACLE)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("latest_order_key"),
            F.to_date("o_orderdate").alias("latest_order_date"),
            F.col("o_totalprice").alias("latest_total_price"),
        )
        .orderBy("customer_key")
    )


# --------------------------------------------------------------------------
# Market-summary slice (SURVEY.md §7.2): period bucketing relative to a
# pinned as-of date, aggregate battery per (entity, period), first/last
# picks via min_by/max_by (replacing the reference's 30-line
# ARRAY_AGG(... ORDER BY ... LIMIT 1)[SAFE_OFFSET(0)] idiom,
# calculate_market_summary.sql:64-102), win rate, annualized volatility.
# Entity = l_returnflag; price series = daily revenue.
# --------------------------------------------------------------------------

_MARKET_SUMMARY_ORACLE = f"""
WITH daily AS (
  SELECT
    l_returnflag AS flag,
    CAST(l_shipdate AS DATE) AS d,
    {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) <= DATE '{AS_OF}'
  GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
),
changed AS (
  SELECT flag, d, revenue,
    revenue - LAG(revenue) OVER (PARTITION BY flag ORDER BY d) AS chg
  FROM daily
),
bucketed AS (
  SELECT *,
    CASE
      WHEN d > DATE '{AS_OF}' - INTERVAL 30 DAY THEN '30d'
      WHEN d > DATE '{AS_OF}' - INTERVAL 90 DAY THEN '90d'
      ELSE 'older'
    END AS period
  FROM changed
),
means AS (
  SELECT flag, period, {sql_davg("revenue")} AS mean_rev
  FROM bucketed GROUP BY flag, period
)
SELECT
  b.flag AS flag,
  b.period AS period,
  COUNT(*) AS n_days,
  m.mean_rev AS avg_revenue,
  {sql_dsum("b.revenue")} AS total_revenue,
  (MIN(b.revenue)) AS min_revenue,
  (MAX(b.revenue)) AS max_revenue,
  {sql_centered_stddev_samp("b.revenue - m.mean_rev")} AS revenue_stddev,
  (MIN_BY(b.revenue, b.d)) AS first_revenue,
  (MAX_BY(b.revenue, b.d)) AS last_revenue,
  (CAST(SUM(CASE WHEN b.chg > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / NULLIF(COUNT(b.chg), 0)) AS win_rate
FROM bucketed b
JOIN means m ON b.flag = m.flag AND b.period = m.period
GROUP BY b.flag, b.period, m.mean_rev
ORDER BY flag, period
"""


@query("market_summary", oracle=_MARKET_SUMMARY_ORACLE)
def market_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.where(F.to_date("l_shipdate") <= F.lit(AS_OF))
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("flag").orderBy("d")
    changed = daily.withColumn(
        "chg", F.col("revenue") - F.lag("revenue").over(w)
    )
    bucketed = changed.withColumn(
        "period",
        F.when(
            F.col("d") > F.date_sub(F.lit(AS_OF).cast("date"), 30), "30d"
        )
        .when(F.col("d") > F.date_sub(F.lit(AS_OF).cast("date"), 90), "90d")
        .otherwise("older"),
    )
    means = bucketed.groupBy("flag", "period").agg(
        davg("revenue").alias("mean_rev")
    )
    dev = F.col("revenue") - F.col("mean_rev")
    return (
        bucketed.join(means, ["flag", "period"])
        .groupBy("flag", "period", "mean_rev")
        .agg(
            F.count("*").alias("n_days"),
            dsum("revenue").alias("total_revenue"),
            (F.min("revenue")).alias("min_revenue"),
            (F.max("revenue")).alias("max_revenue"),
            centered_stddev_samp(dev).alias("revenue_stddev"),
            (F.min_by("revenue", "d")).alias("first_revenue"),
            (F.max_by("revenue", "d")).alias("last_revenue"),
            (
                F.sum(F.when(F.col("chg") > 0, 1).otherwise(0)).cast("double")
                / F.nullif(F.count("chg"), F.lit(0))).alias("win_rate"),
        )
        .withColumnRenamed("mean_rev", "avg_revenue")
        .orderBy("flag", "period")
    )


# --------------------------------------------------------------------------
# Sampled reads (bigquery_warehouse.py:351-398): top-|metric| sample.
# (The RAND() variant is inherently non-deterministic -> not oracle-checked;
# see sources/sampling.py for the API form.)
# --------------------------------------------------------------------------

_TOP_SAMPLE_ORACLE = """
SELECT o_orderkey AS order_key, o_totalprice AS total_price
FROM orders
ORDER BY ABS(o_totalprice) DESC, o_orderkey
LIMIT 100
"""


@query("top_metric_sample", oracle=_TOP_SAMPLE_ORACLE)
def top_metric_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
        )
        .orderBy(F.abs(F.col("total_price")).desc(), F.col("order_key"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# SELECT DISTINCT category scan (bigquery_warehouse.py:400-409).
# --------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT DISTINCT o_orderpriority AS category
FROM orders
WHERE o_orderpriority IS NOT NULL
ORDER BY category
"""


@query("distinct_categories", oracle=_DISTINCT_ORACLE)
def distinct_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_orderpriority").alias("category"))
        .where(F.col("category").isNotNull())
        .distinct()
        .orderBy("category")
    )
