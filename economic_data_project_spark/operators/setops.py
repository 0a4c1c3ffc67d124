"""Set operations (SURVEY.md §2.7): UNION ALL fan-in (46 uses — the
8-way price-universe union, technical_price_universe.sql:31-68), UNION
DISTINCT (economic_alert_inputs.sql:90-96), and INTERSECT/EXCEPT for
completeness.

Spark note: ``unionByName`` keeps schema alignment by name — positional
``union`` is a silent-corruption hazard the reference avoids by generating
column lists from Jinja; name-based union is the Spark-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parity import dsum, sql_dsum
from ..registry import query

_REV = "l_extendedprice * (1 - l_discount)"

_UNION_FANIN_ORACLE = f"""
WITH ship AS (
  SELECT 'ship' AS source,
         date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         {sql_dsum(_REV)} AS amount
  FROM lineitem GROUP BY 2
),
ordered AS (
  SELECT 'order' AS source,
         date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         {sql_dsum("o_totalprice")} AS amount
  FROM orders GROUP BY 2
)
SELECT source, month, amount
FROM (SELECT * FROM ship UNION ALL SELECT * FROM ordered)
ORDER BY source, month
"""


@query("union_all_fanin", oracle=_UNION_FANIN_ORACLE)
def union_all_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ship = li.groupBy(
        F.trunc(F.to_date("l_shipdate"), "month").alias("month")
    ).agg(dsum(rev).alias("amount")).select(
        F.lit("ship").alias("source"), "month", "amount"
    )
    ordered = o.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(dsum("o_totalprice").alias("amount")).select(
        F.lit("order").alias("source"), "month", "amount"
    )
    return ship.unionByName(ordered).orderBy("source", "month")


_UNION_DISTINCT_ORACLE = """
SELECT o_custkey AS customer_key
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
UNION
SELECT o_custkey
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
ORDER BY customer_key
"""


@query("union_distinct_customers", oracle=_UNION_DISTINCT_ORACLE)
def union_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("customer_key")
    )
    y96 = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("customer_key")
    )
    return y95.union(y96).distinct().orderBy("customer_key")


_INTERSECT_ORACLE = """
SELECT o_custkey AS customer_key
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
ORDER BY customer_key
"""


@query("intersect_customers", oracle=_INTERSECT_ORACLE)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("customer_key")
    )
    y96 = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("customer_key")
    )
    return y95.intersect(y96).orderBy("customer_key")


_EXCEPT_ORACLE = """
SELECT o_custkey AS customer_key
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
EXCEPT
SELECT o_custkey
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
ORDER BY customer_key
"""


@query("except_customers", oracle=_EXCEPT_ORACLE)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("customer_key")
    )
    y96 = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("customer_key")
    )
    return y95.subtract(y96).orderBy("customer_key")