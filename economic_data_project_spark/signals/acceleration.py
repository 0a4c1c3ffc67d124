"""Economic acceleration (second-derivative) signals.

Mirror of ``dbt_project/models/signals/economic_acceleration_signals.sql``:
markets price inflection points, not levels — compute the change in the
rate of change for three macro series at mixed grains, count consecutive
months of negative payroll acceleration (the recession tell,
economic_acceleration_signals.sql:39-63), roll 24-month z-scores
(:140-151), and emit the composite + per-series status ladders (:153-196).

Series mapping onto the synthetic warehouse (same grains as the
reference's PAYEMS/CPIAUCSL/GDPC1):

- ``payems``  -> monthly order count (level series, monthly grain)
- ``cpi``     -> monthly average order price (monthly grain)
- ``gdp``     -> quarterly total revenue (quarterly grain, LEFT-joined
  to the monthly spine on DATE_TRUNC quarter, :123-138)

Determinism: the reference's trailing ``CURRENT_DATE - 3 years`` filter
(:198) is dropped — CURRENT_DATE is nondeterministic for an oracle; we
keep the full history. All rolling stats go through the decimal-exact
``ta.wavg/wstd`` identity; first derivatives are rounded to 4 dp before
feeding the z-score windows so the windowed sums are decimal-exact.

Scale: one hash-agg over orders (monthly) + one (quarterly, broadcast
back). The derivative/z-score windows run over the per-month series
(~tens of rows per year) — the documented small-aggregate window policy;
the heavy lifting (the scan + group-by) is fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import ta
from ..registry import query

DEC = "decimal(28,6)"

_ZW_LO, _ZW_HI = -24, -1  # 24-month prior window, self-excluding


def _mom(level, prev):
    return (level / F.nullif(prev, F.lit(0)) - 1) * 100


@query(
    "signal_acceleration",
    oracle="""
WITH monthly AS (
  SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS d,
         CAST(COUNT(*) AS BIGINT) AS payems,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(*) AS cpi
  FROM orders GROUP BY 1
),
quarterly AS (
  SELECT DATE_TRUNC('quarter', CAST(o_orderdate AS DATE)) AS q,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS gdp
  FROM orders GROUP BY 1
),
m1 AS (
  SELECT d, payems, cpi,
    ROUND((payems / NULLIF(LAG(payems) OVER (ORDER BY d), 0) - 1) * 100, 4)
      AS payems_mom_pct,
    ROUND((LAG(payems) OVER (ORDER BY d)
           / NULLIF(LAG(payems, 2) OVER (ORDER BY d), 0) - 1) * 100, 4)
      AS payems_mom_pct_prev,
    ROUND((cpi / NULLIF(LAG(cpi) OVER (ORDER BY d), 0) - 1) * 100, 4)
      AS cpi_mom_pct,
    ROUND((LAG(cpi) OVER (ORDER BY d)
           / NULLIF(LAG(cpi, 2) OVER (ORDER BY d), 0) - 1) * 100, 4)
      AS cpi_mom_pct_prev
  FROM monthly
),
m2 AS (
  SELECT *,
    ROUND(payems_mom_pct - COALESCE(payems_mom_pct_prev, payems_mom_pct), 4)
      AS payems_acceleration,
    ROUND(cpi_mom_pct - COALESCE(cpi_mom_pct_prev, cpi_mom_pct), 4)
      AS cpi_acceleration
  FROM m1
),
m3 AS (
  SELECT *,
    CAST(SUM(CASE WHEN payems_acceleration < 0 THEN 0 ELSE 1 END)
      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS accel_group
  FROM m2
),
m4 AS (
  SELECT *,
    CASE WHEN payems_acceleration < 0
         THEN ROW_NUMBER() OVER (PARTITION BY accel_group ORDER BY d)
         ELSE 0 END AS payems_consecutive_negative
  FROM m3
),
g1 AS (
  SELECT q, gdp,
    ROUND((gdp / NULLIF(LAG(gdp) OVER (ORDER BY q), 0) - 1) * 100, 4)
      AS gdp_qoq_pct,
    ROUND((LAG(gdp) OVER (ORDER BY q)
           / NULLIF(LAG(gdp, 2) OVER (ORDER BY q), 0) - 1) * 100, 4)
      AS gdp_qoq_pct_prev
  FROM quarterly
),
g2 AS (
  SELECT q, gdp, gdp_qoq_pct,
    ROUND(gdp_qoq_pct - COALESCE(gdp_qoq_pct_prev, gdp_qoq_pct), 4)
      AS gdp_acceleration
  FROM g1
),
combined AS (
  SELECT m.*, g.gdp_qoq_pct, g.gdp_acceleration
  FROM m4 m LEFT JOIN g2 g ON DATE_TRUNC('quarter', m.d) = g.q
),
with_stats AS (
  SELECT *,
    ROUND((payems_acceleration - {pz_avg}) / NULLIF({pz_std}, 0), 2)
      AS payems_accel_zscore,
    ROUND((cpi_acceleration - {cz_avg}) / NULLIF({cz_std}, 0), 2)
      AS cpi_accel_zscore
  FROM combined
  WINDOW zw AS (ORDER BY d ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT CAST(d AS DATE) AS date, payems,
  (ROUND(payems_mom_pct, 2) + 0.0) AS payems_mom_pct,
  (payems_acceleration + 0.0) AS payems_acceleration,
  CAST(payems_consecutive_negative AS BIGINT)
    AS payems_consecutive_negative,
  (payems_accel_zscore + 0.0) AS payems_accel_zscore,
  (ROUND(cpi_mom_pct, 2) + 0.0) AS cpi_mom_pct,
  (cpi_acceleration + 0.0) AS cpi_acceleration,
  (cpi_accel_zscore + 0.0) AS cpi_accel_zscore,
  (ROUND(gdp_qoq_pct, 2) + 0.0) AS gdp_qoq_pct,
  (gdp_acceleration + 0.0) AS gdp_acceleration,
  (ROUND((COALESCE(payems_accel_zscore, 0) + COALESCE(cpi_accel_zscore, 0))
        / NULLIF((CASE WHEN payems_accel_zscore IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN cpi_accel_zscore IS NOT NULL THEN 1 ELSE 0 END),
                 0), 3) + 0.0) AS composite_accel_zscore,
  CASE WHEN payems_consecutive_negative >= 3 THEN 'high'
       WHEN payems_consecutive_negative >= 2 THEN 'medium'
       WHEN payems_acceleration < 0 THEN 'low'
       ELSE 'normal' END AS payems_accel_status,
  CASE WHEN cpi_acceleration > 0.1 THEN 'high'
       WHEN cpi_acceleration > 0 THEN 'medium'
       WHEN cpi_acceleration < -0.1 THEN 'low'
       ELSE 'normal' END AS cpi_accel_status,
  CASE WHEN gdp_acceleration < -0.5 THEN 'high'
       WHEN gdp_acceleration < -0.2 THEN 'medium'
       WHEN gdp_acceleration < 0 THEN 'low'
       ELSE 'normal' END AS gdp_accel_status
FROM with_stats
ORDER BY date
""".format(
        pz_avg=ta.sql_wavg("payems_acceleration", "zw"),
        pz_std=ta.sql_wstd("payems_acceleration", "zw"),
        cz_avg=ta.sql_wavg("cpi_acceleration", "zw"),
        cz_std=ta.sql_wstd("cpi_acceleration", "zw"),
    ),
)
def signal_acceleration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    monthly = orders.groupBy(F.trunc(od, "month").alias("d")).agg(
        F.count("*").alias("payems"),
        (
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
            / F.count("*")
        ).alias("cpi"),
    )
    quarterly = orders.groupBy(F.trunc(od, "quarter").alias("q")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("gdp")
    )

    wd = ta.series_window("d")
    m1 = monthly.select(
        "d",
        "payems",
        "cpi",
        F.round(_mom(F.col("payems"), F.lag("payems").over(wd)), 4).alias(
            "payems_mom_pct"
        ),
        F.round(
            _mom(F.lag("payems").over(wd), F.lag("payems", 2).over(wd)), 4
        ).alias("payems_mom_pct_prev"),
        F.round(_mom(F.col("cpi"), F.lag("cpi").over(wd)), 4).alias(
            "cpi_mom_pct"
        ),
        F.round(
            _mom(F.lag("cpi").over(wd), F.lag("cpi", 2).over(wd)), 4
        ).alias("cpi_mom_pct_prev"),
    )
    m2 = m1.select(
        "*",
        F.round(
            F.col("payems_mom_pct")
            - F.coalesce("payems_mom_pct_prev", "payems_mom_pct"),
            4,
        ).alias("payems_acceleration"),
        F.round(
            F.col("cpi_mom_pct")
            - F.coalesce("cpi_mom_pct_prev", "cpi_mom_pct"),
            4,
        ).alias("cpi_acceleration"),
    )
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    m3 = m2.withColumn(
        "accel_group",
        F.sum(
            F.when(F.col("payems_acceleration") < 0, 0).otherwise(1)
        ).over(wcum),
    )
    wgrp = Window.partitionBy("accel_group").orderBy("d")
    m4 = m3.withColumn(
        "payems_consecutive_negative",
        F.when(
            F.col("payems_acceleration") < 0,
            F.row_number().over(wgrp),
        )
        .otherwise(0)
        .cast("long"),
    )

    wq = ta.series_window("q")
    g2 = quarterly.select(
        "q",
        F.round(_mom(F.col("gdp"), F.lag("gdp").over(wq)), 4).alias(
            "gdp_qoq_pct"
        ),
        F.round(
            _mom(F.lag("gdp").over(wq), F.lag("gdp", 2).over(wq)), 4
        ).alias("gdp_qoq_pct_prev"),
    ).select(
        "q",
        "gdp_qoq_pct",
        F.round(
            F.col("gdp_qoq_pct")
            - F.coalesce("gdp_qoq_pct_prev", "gdp_qoq_pct"),
            4,
        ).alias("gdp_acceleration"),
    )

    combined = m4.join(
        F.broadcast(g2), F.trunc(F.col("d"), "quarter") == F.col("q"), "left"
    )
    zw = wd.rowsBetween(_ZW_LO, _ZW_HI)
    pz = F.round(
        (F.col("payems_acceleration") - ta.wavg("payems_acceleration", zw))
        / F.nullif(ta.wstd("payems_acceleration", zw), F.lit(0)),
        2,
    )
    cz = F.round(
        (F.col("cpi_acceleration") - ta.wavg("cpi_acceleration", zw))
        / F.nullif(ta.wstd("cpi_acceleration", zw), F.lit(0)),
        2,
    )
    stats = combined.select("*", pz.alias("payems_accel_zscore"),
                            cz.alias("cpi_accel_zscore"))

    n_avail = F.when(F.col("payems_accel_zscore").isNotNull(), 1).otherwise(
        0
    ) + F.when(F.col("cpi_accel_zscore").isNotNull(), 1).otherwise(0)
    # 3 dp, not the reference's 2 (:167-171): the mean of two 2dp
    # z-scores lands exactly on half-cent ties where Spark's and
    # DuckDB's double ROUND tie-breaks disagree; 3 dp is exact.
    composite = F.round(
        (
            F.coalesce("payems_accel_zscore", F.lit(0.0))
            + F.coalesce("cpi_accel_zscore", F.lit(0.0))
        )
        / F.nullif(n_avail, F.lit(0)),
        3,
    )
    # every emitted float gets the `+ 0.0` signed-zero collapse from
    # ta.emit's parity rule: DuckDB's ROUND propagates -0.0 where
    # Spark's does not, and the sf0.1 sweep caught exactly that on
    # payems_accel_zscore (repr('-0.0') hash-mismatches repr('0.0')).
    z = F.lit(0.0)
    return stats.select(
        F.col("d").alias("date"),
        "payems",
        (F.round("payems_mom_pct", 2) + z).alias("payems_mom_pct"),
        (F.col("payems_acceleration") + z).alias("payems_acceleration"),
        "payems_consecutive_negative",
        (F.col("payems_accel_zscore") + z).alias("payems_accel_zscore"),
        (F.round("cpi_mom_pct", 2) + z).alias("cpi_mom_pct"),
        (F.col("cpi_acceleration") + z).alias("cpi_acceleration"),
        (F.col("cpi_accel_zscore") + z).alias("cpi_accel_zscore"),
        (F.round("gdp_qoq_pct", 2) + z).alias("gdp_qoq_pct"),
        (F.col("gdp_acceleration") + z).alias("gdp_acceleration"),
        (composite + z).alias("composite_accel_zscore"),
        F.when(F.col("payems_consecutive_negative") >= 3, "high")
        .when(F.col("payems_consecutive_negative") >= 2, "medium")
        .when(F.col("payems_acceleration") < 0, "low")
        .otherwise("normal")
        .alias("payems_accel_status"),
        F.when(F.col("cpi_acceleration") > 0.1, "high")
        .when(F.col("cpi_acceleration") > 0, "medium")
        .when(F.col("cpi_acceleration") < -0.1, "low")
        .otherwise("normal")
        .alias("cpi_accel_status"),
        F.when(F.col("gdp_acceleration") < -0.5, "high")
        .when(F.col("gdp_acceleration") < -0.2, "medium")
        .when(F.col("gdp_acceleration") < 0, "low")
        .otherwise("normal")
        .alias("gdp_accel_status"),
    ).orderBy("date")
