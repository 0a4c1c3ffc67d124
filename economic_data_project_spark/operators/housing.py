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
