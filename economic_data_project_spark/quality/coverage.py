"""Series grain / coverage inference.

Mirror of ``dbt_project/models/government/fred_series_grain.sql``: given a
long store of heterogeneous time series, count each series' observations
in the trailing 12 months and classify its publication frequency by
count thresholds (>=200 Daily, >=50 Weekly, >=9 Monthly, >=2 Quarterly,
>=1 Annually, fred_series_grain.sql:28-46).

The synthetic series store is a UNION of mixed-grain series derived from
the warehouse — daily ship-date series per returnflag, weekly series per
linestatus, monthly series per order priority, quarterly per order
status — standing in for ``stg_fred_series``'s mixed
daily/weekly/monthly/quarterly codes. Determinism: the reference anchors
the trailing window at CURRENT_DATE (:1-5); we anchor at the union-wide
MAX(date) so the oracle is reproducible.

Scale: each branch is a hash-agg (DISTINCT grain-date per code) pushed to
the source scan; the union is of per-series DATE rows (tiny); the final
count + CASE ladder is one small agg. The global-max anchor is a
broadcast scalar, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_ORACLE = """
WITH series_store AS (
  SELECT 'SHIP_' || l_returnflag AS series_code,
         'Daily shipments flag ' || l_returnflag AS series_name,
         CAST(l_shipdate AS DATE) AS date
  FROM lineitem GROUP BY 1, 2, 3
  UNION ALL
  SELECT 'SHIPWK_' || l_linestatus,
         'Weekly shipments status ' || l_linestatus,
         date_trunc('week', CAST(l_shipdate AS DATE))
  FROM lineitem GROUP BY 1, 2, 3
  UNION ALL
  SELECT 'ORDM_' || o_orderpriority,
         'Monthly orders priority ' || o_orderpriority,
         date_trunc('month', CAST(o_orderdate AS DATE))
  FROM orders GROUP BY 1, 2, 3
  UNION ALL
  SELECT 'ORDQ_' || o_orderstatus,
         'Quarterly orders status ' || o_orderstatus,
         date_trunc('quarter', CAST(o_orderdate AS DATE))
  FROM orders GROUP BY 1, 2, 3
),
bounds AS (
  SELECT MAX(date) AS end_date,
         MAX(date) - INTERVAL 12 MONTH AS start_date
  FROM series_store
)
SELECT s.series_code, s.series_name,
  CAST(COUNT(*) AS BIGINT) AS entry_count,
  (CASE WHEN COUNT(*) >= 200 THEN 'Daily'
        WHEN COUNT(*) >= 50 THEN 'Weekly'
        WHEN COUNT(*) >= 9 THEN 'Monthly'
        WHEN COUNT(*) >= 2 THEN 'Quarterly'
        WHEN COUNT(*) >= 1 THEN 'Annually'
        ELSE 'Limited Data' END) AS coverage_status
FROM series_store s, bounds d
WHERE s.date >= d.start_date AND s.date <= d.end_date
GROUP BY s.series_code, s.series_name
ORDER BY entry_count DESC, series_code
"""


@query("series_grain_coverage", oracle=_ORACLE)
def series_grain_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ship = F.to_date("l_shipdate")
    od = F.to_date("o_orderdate")

    def series(df, code, name, date_col):
        return df.select(
            code.alias("series_code"),
            name.alias("series_name"),
            date_col.alias("date"),
        ).distinct()

    store = (
        series(
            li,
            F.concat(F.lit("SHIP_"), F.col("l_returnflag")),
            F.concat(F.lit("Daily shipments flag "), F.col("l_returnflag")),
            ship,
        )
        .unionByName(
            series(
                li,
                F.concat(F.lit("SHIPWK_"), F.col("l_linestatus")),
                F.concat(
                    F.lit("Weekly shipments status "),
                    F.col("l_linestatus"),
                ),
                F.trunc(ship, "week"),
            )
        )
        .unionByName(
            series(
                orders,
                F.concat(F.lit("ORDM_"), F.col("o_orderpriority")),
                F.concat(
                    F.lit("Monthly orders priority "),
                    F.col("o_orderpriority"),
                ),
                F.trunc(od, "month"),
            )
        )
        .unionByName(
            series(
                orders,
                F.concat(F.lit("ORDQ_"), F.col("o_orderstatus")),
                F.concat(
                    F.lit("Quarterly orders status "),
                    F.col("o_orderstatus"),
                ),
                F.trunc(od, "quarter"),
            )
        )
    )
    bounds = store.agg(
        F.max("date").alias("end_date"),
        F.add_months(F.max("date"), -12).alias("start_date"),
    )
    n = F.count("*")
    return (
        store.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("date") >= F.col("start_date"))
            & (F.col("date") <= F.col("end_date"))
        )
        .groupBy("series_code", "series_name")
        .agg(
            n.cast("long").alias("entry_count"),
            F.when(n >= 200, "Daily")
            .when(n >= 50, "Weekly")
            .when(n >= 9, "Monthly")
            .when(n >= 2, "Quarterly")
            .when(n >= 1, "Annually")
            .otherwise("Limited Data")
            .alias("coverage_status"),
        )
        .orderBy(F.col("entry_count").desc(), "series_code")
    )
