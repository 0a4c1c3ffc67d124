"""Market-breadth composite: advance/decline universe stats -> exact
recursive EMAs -> McClellan oscillator / summation index -> Zweig thrust.

Re-expresses the reference's market_breadth_signals.sql pipeline
(daily_breadth:37-135 advance/decline + RANA + A/D line;
ema_calc:168-192 recursive-CTE EMAs with literal coefficients;
breadth_with_mcclellan:200-218 oscillator, summation index + 1000,
Zweig thrust 0.615/0.40 rule) on the synthetic universe: entity =
supplier nation (25 members via the broadcast supplier dim), market
series = daily per-nation revenue.

Spark-first shape:
- per-nation daily aggregate: distributed hash agg, broadcast dim join
- advance/decline flags: LAG per nation partition (distributed)
- market-wide daily rollup: second hash agg to ~n_days rows
- exact EMA recursion: ONE applyInPandas group over the daily series —
  the market series is inherently a single global sequence (the
  reference's recursive CTE is equally serial); state is O(1), input is
  the daily aggregate, never the facts
- cumulative sums ride decimal-cast window frames (the obv pattern) so
  Spark's linear accumulation and DuckDB's segment-tree order agree

The EMA coefficients are copied literal-for-literal from the reference
(0.1 / 0.9, 0.05 / 0.95, 0.1818181818 / 0.8181818182) and the kernel
applies them in the same expression order as the WITH RECURSIVE oracle,
so doubles are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.parity import sql_dsum
from ..registry import query

DEC = "decimal(28,6)"

_BREADTH_CTES = f"""
per_nation AS (
  SELECT s.s_nationkey AS nation, CAST(l.l_shipdate AS DATE) AS d,
         {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, CAST(l.l_shipdate AS DATE)
),
flagged AS (
  SELECT nation, d, rev,
         LAG(rev) OVER (PARTITION BY nation ORDER BY d) AS prev_rev
  FROM per_nation
),
daily_breadth AS (
  SELECT d,
    CAST(SUM(CASE WHEN prev_rev IS NOT NULL AND rev > prev_rev
                  THEN 1 ELSE 0 END) AS BIGINT) AS advancing,
    CAST(SUM(CASE WHEN prev_rev IS NOT NULL AND rev < prev_rev
                  THEN 1 ELSE 0 END) AS BIGINT) AS declining
  FROM flagged
  GROUP BY d
),
breadth_base AS (
  SELECT d, advancing, declining,
    (advancing - declining) AS ad_line_delta,
    COALESCE((advancing - declining) * 1000.0
               / NULLIF(advancing + declining, 0), 0.0) AS rana,
    COALESCE(1.0 * advancing / NULLIF(advancing + declining, 0), 0.5)
      AS adv_ratio
  FROM daily_breadth
)
"""

_MCCLELLAN_ORACLE = f"""
WITH RECURSIVE {_BREADTH_CTES},
numbered AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM breadth_base
),
ema_calc AS (
  SELECT rn, d, rana, adv_ratio,
         rana AS ema_rana_19, rana AS ema_rana_39,
         adv_ratio AS ema_adv_10
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.d, i.rana, i.adv_ratio,
         (0.1 * i.rana) + (0.9 * e.ema_rana_19),
         (0.05 * i.rana) + (0.95 * e.ema_rana_39),
         (0.1818181818 * i.adv_ratio) + (0.8181818182 * e.ema_adv_10)
  FROM numbered i JOIN ema_calc e ON i.rn = e.rn + 1
),
with_ema AS (
  SELECT b.d, b.advancing, b.declining, b.ad_line_delta, b.rana,
         b.adv_ratio, e.ema_rana_19, e.ema_rana_39, e.ema_adv_10,
         (e.ema_rana_19 - e.ema_rana_39) AS mcclellan_oscillator
  FROM breadth_base b JOIN ema_calc e ON b.d = e.d
)
SELECT d, advancing, declining,
  CAST(SUM(ad_line_delta) OVER wcum AS BIGINT) AS ad_line_cumulative,
  rana, adv_ratio, ema_rana_19, ema_rana_39, ema_adv_10,
  mcclellan_oscillator,
  (CAST(SUM(CAST(mcclellan_oscillator AS DECIMAL(28,6))) OVER wcum
        AS DOUBLE) + 1000.0) AS mcclellan_summation_index,
  (CASE WHEN ema_adv_10 >= 0.615
          AND MIN(ema_adv_10) OVER (
                ORDER BY d ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) < 0.40
        THEN 1 ELSE 0 END) AS zweig_thrust_signal
FROM with_ema
WINDOW wcum AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW)
ORDER BY d
"""


@query("market_breadth_mcclellan", oracle=_MCCLELLAN_ORACLE)
def market_breadth_mcclellan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_nation = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(F.sum(rev.cast(DEC)).cast("double").alias("rev"))
    )
    wn = Window.partitionBy("nation").orderBy("d")
    flagged = per_nation.withColumn("prev_rev", F.lag("rev").over(wn))
    has_prev = F.col("prev_rev").isNotNull()
    daily = flagged.groupBy("d").agg(
        F.sum(
            F.when(has_prev & (F.col("rev") > F.col("prev_rev")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("advancing"),
        F.sum(
            F.when(has_prev & (F.col("rev") < F.col("prev_rev")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("declining"),
    )
    total = F.col("advancing") + F.col("declining")
    base = daily.select(
        "d",
        "advancing",
        "declining",
        (F.col("advancing") - F.col("declining")).alias("ad_line_delta"),
        F.coalesce(
            (F.col("advancing") - F.col("declining"))
            * 1000.0
            / F.nullif(total, F.lit(0)),
            F.lit(0.0),
        ).alias("rana"),
        F.coalesce(
            1.0 * F.col("advancing") / F.nullif(total, F.lit(0)),
            F.lit(0.5),
        ).alias("adv_ratio"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        rana = pdf["rana"].to_numpy(dtype=float)
        ratio = pdf["adv_ratio"].to_numpy(dtype=float)
        e19 = np.empty_like(rana)
        e39 = np.empty_like(rana)
        e10 = np.empty_like(rana)
        if len(rana):
            e19[0], e39[0], e10[0] = rana[0], rana[0], ratio[0]
            # literal coefficients, same expression order as the oracle
            for t in range(1, len(rana)):
                e19[t] = (0.1 * rana[t]) + (0.9 * e19[t - 1])
                e39[t] = (0.05 * rana[t]) + (0.95 * e39[t - 1])
                e10[t] = (0.1818181818 * ratio[t]) + (
                    0.8181818182 * e10[t - 1]
                )
        pdf["ema_rana_19"] = e19
        pdf["ema_rana_39"] = e39
        pdf["ema_adv_10"] = e10
        return pdf  # grp kept: downstream windows partition on it

    with_ema = (
        base.withColumn("grp", F.lit(1))
        .groupBy("grp")
        .applyInPandas(
            kernel,
            "grp int, d date, advancing bigint, declining bigint,"
            " ad_line_delta bigint, rana double, adv_ratio double,"
            " ema_rana_19 double, ema_rana_39 double, ema_adv_10 double",
        )
        .withColumn(
            "mcclellan_oscillator",
            F.col("ema_rana_19") - F.col("ema_rana_39"),
        )
    )
    # The market series is a single sequence; windows partition on the
    # constant grp DATA column (one partition, explicit spec — no
    # physical-layout dependence, no unpartitioned-window fallback).
    wcum = (
        Window.partitionBy("grp")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w10 = Window.partitionBy("grp").orderBy("d").rowsBetween(-9, 0)
    return with_ema.select(
        "d",
        "advancing",
        "declining",
        F.sum("ad_line_delta").over(wcum).cast("bigint").alias(
            "ad_line_cumulative"
        ),
        "rana",
        "adv_ratio",
        "ema_rana_19",
        "ema_rana_39",
        "ema_adv_10",
        "mcclellan_oscillator",
        (
            F.sum(F.col("mcclellan_oscillator").cast(DEC))
            .over(wcum)
            .cast("double")
            + 1000.0
        ).alias("mcclellan_summation_index"),
        F.when(
            (F.col("ema_adv_10") >= 0.615)
            & (F.min("ema_adv_10").over(w10) < 0.40),
            1,
        )
        .otherwise(0)
        .alias("zweig_thrust_signal"),
    ).orderBy("d")


# --------------------------------------------------------------------------
# Per-sector % of members above the 200-day MA, sampled weekly
# (analysis/dispersion/sector_breadth_timeseries.sql:37-115): per-member
# 200d SMA with a warm-up count guard, member->sector rollup to a daily
# percentage, then ROW_NUMBER-downsampling to the last trading day per
# (sector, week). Members = the 25 nations; sectors = their regions.
# The CURRENT_DATE trailing windows are dropped (oracle determinism) —
# the warm-up guard alone trims the early series.
# --------------------------------------------------------------------------

_BREADTH_TS_ORACLE = """
WITH member_daily AS (
  SELECT n_name AS member, r_name AS sector,
         CAST(l_shipdate AS DATE) AS date,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(28,6))) AS DOUBLE) / 1e6 AS price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
),
with_ma AS (
  SELECT *,
    CAST(SUM(CAST(price AS DECIMAL(28,6))) OVER w200 AS DOUBLE)
      / COUNT(*) OVER w200 AS sma_200,
    COUNT(*) OVER w200 AS ma_days
  FROM member_daily
  WINDOW w200 AS (PARTITION BY member ORDER BY date
                  ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
),
flags AS (
  SELECT date, sector,
    (CASE WHEN ma_days >= 200 AND price > sma_200 THEN 1 ELSE 0 END)
      AS above_200_ma
  FROM with_ma
  WHERE ma_days >= 200
),
daily_breadth AS (
  SELECT date, sector,
    CAST(COUNT(*) AS BIGINT) AS sector_member_count,
    CAST(SUM(above_200_ma) AS BIGINT) AS members_above_200_ma,
    ROUND(SUM(above_200_ma) * 100.0 / COUNT(*), 1) AS pct_above_200_ma
  FROM flags GROUP BY date, sector
),
weekly AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY sector, date_trunc('week', date)
                       ORDER BY date DESC) AS rn
  FROM daily_breadth
)
SELECT date, sector, sector_member_count, members_above_200_ma,
       pct_above_200_ma
FROM weekly WHERE rn = 1
ORDER BY date, sector
"""


@query("sector_breadth_timeseries", oracle=_BREADTH_TS_ORACLE)
def sector_breadth_timeseries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        DEC
    )
    member_daily = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(
            F.col("n_name").alias("member"),
            F.col("r_name").alias("sector"),
            F.to_date("l_shipdate").alias("date"),
        )
        .agg((F.sum(rev).cast("double") / F.lit(1e6)).alias("price"))
    )
    w200 = (
        Window.partitionBy("member")
        .orderBy("date")
        .rowsBetween(-199, 0)
    )
    sma = (
        F.sum(F.col("price").cast(DEC)).over(w200).cast("double")
        / F.count("*").over(w200)
    )
    flags = (
        member_daily.select(
            "date",
            "sector",
            sma.alias("sma_200"),
            F.count("*").over(w200).alias("ma_days"),
            "price",
        )
        .where(F.col("ma_days") >= 200)
        .select(
            "date",
            "sector",
            F.when(F.col("price") > F.col("sma_200"), 1)
            .otherwise(0)
            .alias("above_200_ma"),
        )
    )
    daily_breadth = flags.groupBy("date", "sector").agg(
        F.count("*").cast("long").alias("sector_member_count"),
        F.sum("above_200_ma").cast("long").alias(
            "members_above_200_ma"
        ),
        F.round(
            F.sum("above_200_ma") * 100.0 / F.count("*"), 1
        ).alias("pct_above_200_ma"),
    )
    wk = Window.partitionBy(
        "sector", F.trunc("date", "week")
    ).orderBy(F.col("date").desc())
    return (
        daily_breadth.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("date", "sector")
    )
