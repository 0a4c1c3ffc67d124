"""Quarter-string parsing + cross-grain annual join.

Mirror of ``dbt_project/models/government/housing_inventory_and_population.sql``:
the source stores quarters as ``'YYYYQn'`` strings; the model parses
them into real dates with the RIGHT/LEFT CASE ladder (:18-28 — Q1->01-01,
Q2->04-01, Q3->07-01, Q4->10-01), joins an annual households series on
the extracted year (:45-62 — a quarterly-to-annual grain join), and
filters to a series allowlist (:64-68).

Mapping: the quarterly inventory series = per-order-status quarterly
revenue keyed by the formatted ``'YYYYQn'`` string (built then parsed —
the operator under test is the parse + grain join, exactly what the
reference does to its raw census strings); households = distinct
customers per year.

Scale: two hash-aggs over orders; the year join is broadcast (annual
rows are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

DEC = "decimal(28,6)"

_PARSE = """(CASE
    WHEN right(time, 2) = 'Q1' THEN CAST(left(time, 4) || '-01-01' AS DATE)
    WHEN right(time, 2) = 'Q2' THEN CAST(left(time, 4) || '-04-01' AS DATE)
    WHEN right(time, 2) = 'Q3' THEN CAST(left(time, 4) || '-07-01' AS DATE)
    WHEN right(time, 2) = 'Q4' THEN CAST(left(time, 4) || '-10-01' AS DATE)
  END)"""

_ORACLE = f"""
WITH housing_inventory AS (
  SELECT 'Status ' || o_orderstatus AS series_name,
    CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR) || 'Q'
      || CAST(EXTRACT(QUARTER FROM o_orderdate) AS VARCHAR) AS time,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / 1e6
      AS series_value
  FROM orders GROUP BY 1, 2
),
hs AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS number_of_households
  FROM orders GROUP BY 1
)
SELECT hi.series_name, hi.series_value,
  {_PARSE} AS time_date,
  hs.number_of_households,
  CAST(EXTRACT(YEAR FROM {_PARSE}) AS BIGINT) AS year
FROM housing_inventory hi
LEFT JOIN hs ON EXTRACT(YEAR FROM {_PARSE}) = hs.year
WHERE hi.series_name IN ('Status O', 'Status F')
ORDER BY time_date, series_name
"""


@query("housing_inventory_population", oracle=_ORACLE)
def housing_inventory_population(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    hi = orders.groupBy(
        F.concat(F.lit("Status "), F.col("o_orderstatus")).alias(
            "series_name"
        ),
        F.concat(
            F.year(od).cast("string"),
            F.lit("Q"),
            F.quarter(od).cast("string"),
        ).alias("time"),
    ).agg(
        (
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
            / F.lit(1e6)
        ).alias("series_value")
    )
    hs = orders.groupBy(F.year(od).cast("long").alias("year")).agg(
        F.countDistinct("o_custkey").cast("long").alias(
            "number_of_households"
        )
    )
    q_month = {
        "Q1": "-01-01",
        "Q2": "-04-01",
        "Q3": "-07-01",
        "Q4": "-10-01",
    }
    parse = None
    for q, suffix in q_month.items():
        branch = F.when(
            F.substring("time", -2, 2) == q,
            F.concat(F.substring("time", 1, 4), F.lit(suffix)).cast(
                "date"
            ),
        )
        parse = branch if parse is None else parse.when(
            F.substring("time", -2, 2) == q,
            F.concat(F.substring("time", 1, 4), F.lit(suffix)).cast(
                "date"
            ),
        )
    parsed = hi.where(
        F.col("series_name").isin("Status O", "Status F")
    ).select(
        "series_name",
        "series_value",
        parse.alias("time_date"),
    )
    return (
        parsed.withColumn("year", F.year("time_date").cast("long"))
        .join(F.broadcast(hs), on="year", how="left")
        .select(
            "series_name",
            "series_value",
            "time_date",
            "number_of_households",
            "year",
        )
        .orderBy("time_date", "series_name")
    )


# ------------------------------------------------------- mortgage rates
#
# Mirror of ``dbt_project/models/government/housing_mortgage_rates.sql``:
# monthly-resampled rate series joined to a monthly price series (:14-36),
# then the 30-year amortization payment
#   P * (r/12/100 * (1+r/12/100)^360) / ((1+r/12/100)^360 - 1)
# at 0% and 20% down (:38-55).
#
# Mapping: mortgage_rate = monthly mean of 100*l_discount (a 0-10 "rate"
# with obs per lineitem row, the monthly AVG resample of a daily series);
# median price = monthly mean o_totalprice. Determinism: rates/prices are
# decimal-exact-sum quotients emitted unrounded (identical IEEE division
# cross-engine); the payment keeps the reference's ROUND(...,2) — safe
# because pow() output is irrational-dense (memory: ROUND after
# libm/sqrt is tie-free; both engines' pow agree far beyond 2dp here).
#
# Scale: two partial-agg'd hash-aggs; the month-grain join is a shuffle
# on ~hundreds of rows after aggregation (broadcast either side).

_MORTGAGE_ORACLE = """
WITH rate AS (
  SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS date,
    CAST(SUM(CAST(l_discount * 100 AS DECIMAL(28,6))) AS DOUBLE)
      / COUNT(*) AS mortgage_rate
  FROM lineitem GROUP BY 1
),
price AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS date,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
      AS median_price_no_down_payment,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
      * 0.8 AS median_price_20_pct_down_payment
  FROM orders GROUP BY 1
)
SELECT CAST(rate.date AS DATE) AS date,
  median_price_no_down_payment,
  median_price_20_pct_down_payment,
  mortgage_rate,
  ROUND(
    median_price_no_down_payment
    * (mortgage_rate / 12 / 100
       * power(1 + mortgage_rate / 12 / 100, 360))
    / (power(1 + mortgage_rate / 12 / 100, 360) - 1),
    2) AS monthly_payment_no_down_payment,
  ROUND(
    median_price_20_pct_down_payment
    * (mortgage_rate / 12 / 100
       * power(1 + mortgage_rate / 12 / 100, 360))
    / (power(1 + mortgage_rate / 12 / 100, 360) - 1),
    2) AS monthly_payment_20_pct_down_payment
FROM rate
INNER JOIN price ON rate.date = price.date
ORDER BY rate.date ASC
"""


@query("housing_mortgage_rates", oracle=_MORTGAGE_ORACLE)
def housing_mortgage_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rate = li.groupBy(
        F.trunc(F.to_date("l_shipdate"), "month").alias("date")
    ).agg(
        (
            F.sum((F.col("l_discount") * 100).cast(DEC)).cast("double")
            / F.count("*")
        ).alias("mortgage_rate")
    )
    base_price = (
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
        / F.count("*")
    )
    price = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("date")
    ).agg(
        base_price.alias("median_price_no_down_payment"),
        (base_price * 0.8).alias("median_price_20_pct_down_payment"),
    )
    r = F.col("mortgage_rate") / 12 / 100
    growth = F.pow(r + 1, 360)
    pay_factor = r * growth / (growth - 1)
    return (
        rate.join(price, "date")
        .select(
            "date",
            "median_price_no_down_payment",
            "median_price_20_pct_down_payment",
            "mortgage_rate",
            F.round(
                F.col("median_price_no_down_payment") * pay_factor, 2
            ).alias("monthly_payment_no_down_payment"),
            F.round(
                F.col("median_price_20_pct_down_payment") * pay_factor, 2
            ).alias("monthly_payment_20_pct_down_payment"),
        )
        .orderBy("date")
    )
