"""Net-liquidity indicator: Fed balance sheet minus TGA minus RRP.

Mirror of ``dbt_project/models/signals/net_liquidity_signals.sql``:
three daily series resampled to weekly (:28-52), the 3-component
subtraction with a 2-component fallback when the middle series is absent
(:54-66 — COALESCE + component_count), 4w/13w moving averages, 4/13/52w
rate-of-change, a 52w exclusive-window z-score (:68-84), and the
trend / signal-status / RRP-depletion CASE ladders (:86-123).

Mapping: WALCL = weekly revenue of returnflag N, WTREGEN = flag R,
RRPONTSYD = flag A (three independent "series" on the weekly grain; the
flag-N week set is the spine, exactly like WALCL's weekly grain in the
reference). The weekly resample uses the decimal-exact SUM rather than
the reference's AVG-over-days: an avg's day-count quotient re-enters the
decimal window cast lossily, while the sum keeps every windowed value an
exact 4dp decimal (memory: spark-duckdb-determinism); on an additive
flow series the weekly grain semantics are unchanged. RRP depletion
thresholds are rescaled to the synthetic magnitude (2.0/2.8/3.2 M vs the
reference's 50/200/500 B, :118-123).

Determinism: component, net, moving-average and pct-change columns
are emitted unrounded (exact decimal sums and deterministic IEEE
quotients — rounding them would ADD risk: sum/count quotients
terminate at the 7th decimal digit where the engines' ROUNDs
disagree, see signals/volatility.py). The z-score keeps the
reference's ROUND(...,2) but through ``ta.emit``/``ta.sql_emit``:
the ``+ 0.0`` collapses IEEE -0.0, which DuckDB's ROUND propagates
where Spark emits +0.0 (observed at exactly-zero deviations).

Scale: one hash-agg per component; the weekly joins and windows operate
on the weekly aggregate (~50 rows/year) — the unpartitioned window is
the documented tiny-aggregate exception (README scale policy); at 100 TB
the weekly grain is still thousands of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import ta
from ..registry import query

_REV = "l_extendedprice * (1 - l_discount)"
RRP_HIGH, RRP_MED, RRP_LOW = 2_000_000.0, 2_800_000.0, 3_200_000.0


def _weekly_sql(flag: str, alias: str) -> str:
    return f"""
  SELECT date_trunc('week', CAST(l_shipdate AS DATE)) AS week_date,
    CAST(SUM(CAST({_REV} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}
  FROM lineitem WHERE l_returnflag = '{flag}'
  GROUP BY 1"""


def _pct_sql(n: int) -> str:
    return (
        f"((net_liquidity / NULLIF(LAG(net_liquidity, {n}) OVER wd, 0))"
        f" - 1) * 100 AS net_liquidity_{n}w_pct_change"
    )


_Z = (
    "(net_liquidity - {m}) / NULLIF({s}, 0)".format(
        m=ta.sql_wavg("net_liquidity", "wz"),
        s=ta.sql_wstd("net_liquidity", "wz"),
    )
)

_ORACLE = f"""
WITH walcl_weekly AS ({_weekly_sql("N", "walcl")}),
wtregen_weekly AS ({_weekly_sql("R", "wtregen")}),
rrp_weekly AS ({_weekly_sql("A", "rrpontsyd")}),
combined AS (
  SELECT w.week_date AS date, w.walcl, wt.wtregen, r.rrpontsyd,
    w.walcl - COALESCE(wt.wtregen, 0) - COALESCE(r.rrpontsyd, 0)
      AS net_liquidity,
    CAST(CASE WHEN wt.wtregen IS NOT NULL THEN 3 ELSE 2 END AS BIGINT)
      AS component_count
  FROM walcl_weekly w
  LEFT JOIN wtregen_weekly wt ON w.week_date = wt.week_date
  LEFT JOIN rrp_weekly r ON w.week_date = r.week_date
)
SELECT CAST(date AS DATE) AS date, walcl, wtregen, rrpontsyd,
  net_liquidity, component_count,
  {ta.sql_wavg("net_liquidity", "w4")} AS net_liquidity_4w_avg,
  {ta.sql_wavg("net_liquidity", "w13")} AS net_liquidity_13w_avg,
  {_pct_sql(4)},
  {_pct_sql(13)},
  {_pct_sql(52)},
  {ta.sql_emit(_Z, 2)} AS net_liquidity_zscore,
  (CASE
     WHEN net_liquidity > {ta.sql_wavg("net_liquidity", "w4")}
      AND {ta.sql_wavg("net_liquidity", "w4")}
        > {ta.sql_wavg("net_liquidity", "w13")} THEN 'expanding'
     WHEN net_liquidity < {ta.sql_wavg("net_liquidity", "w4")}
      AND {ta.sql_wavg("net_liquidity", "w4")}
        < {ta.sql_wavg("net_liquidity", "w13")} THEN 'contracting'
     ELSE 'mixed'
   END) AS net_liquidity_trend,
  (CASE
     WHEN {_Z} < -2 THEN 'high'
     WHEN {_Z} < -1 THEN 'medium'
     WHEN net_liquidity < {ta.sql_wavg("net_liquidity", "w4")}
      AND {ta.sql_wavg("net_liquidity", "w4")}
        < {ta.sql_wavg("net_liquidity", "w13")} THEN 'low'
     ELSE 'normal'
   END) AS net_liquidity_status,
  (CASE
     WHEN rrpontsyd IS NOT NULL AND rrpontsyd < {RRP_HIGH!r} THEN 'high'
     WHEN rrpontsyd IS NOT NULL AND rrpontsyd < {RRP_MED!r} THEN 'medium'
     WHEN rrpontsyd IS NOT NULL AND rrpontsyd < {RRP_LOW!r} THEN 'low'
     ELSE 'normal'
   END) AS rrp_depletion_status
FROM combined
WINDOW
  wd AS (ORDER BY date),
  w4 AS (ORDER BY date ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
  w13 AS (ORDER BY date ROWS BETWEEN 12 PRECEDING AND CURRENT ROW),
  wz AS (ORDER BY date ROWS BETWEEN 52 PRECEDING AND 1 PRECEDING)
ORDER BY date
"""


@query("net_liquidity_signals", oracle=_ORACLE)
def net_liquidity_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.expr(_REV).cast(ta.DEC)

    # Single-pass conditional aggregation (r9): the three weekly
    # component series are disjoint filters of the SAME fact table, so
    # one scan + one week-keyed hash agg with per-flag conditional
    # SUMs replaces three scans + three shuffles + two joins — at
    # 100 TB that's two full IO passes saved for free. The oracle's
    # spine is the flag-N aggregate (weeks with >= 1 N row), recovered
    # exactly by the n_walcl presence count — NOT by walcl IS NOT NULL,
    # which would diverge if a week's revenues were all NULL.
    def flag_sum(flag: str):
        return F.sum(
            F.when(F.col("l_returnflag") == flag, rev)
        ).cast("double")

    combined = (
        li.where(F.col("l_returnflag").isin("N", "R", "A"))
        .groupBy(
            F.trunc(F.to_date("l_shipdate"), "week").alias("week_date")
        )
        .agg(
            flag_sum("N").alias("walcl"),
            flag_sum("R").alias("wtregen"),
            flag_sum("A").alias("rrpontsyd"),
            F.count(
                F.when(F.col("l_returnflag") == "N", F.lit(1))
            ).alias("n_walcl"),
        )
        .where(F.col("n_walcl") > 0)
        .select(
            F.col("week_date").alias("date"),
            "walcl",
            "wtregen",
            "rrpontsyd",
            (
                F.col("walcl")
                - F.coalesce("wtregen", F.lit(0.0))
                - F.coalesce("rrpontsyd", F.lit(0.0))
            ).alias("net_liquidity"),
            F.when(F.col("wtregen").isNotNull(), 3)
            .otherwise(2)
            .cast("long")
            .alias("component_count"),
        )
    )

    wd = ta.series_window("date")
    w4 = wd.rowsBetween(-3, 0)
    w13 = wd.rowsBetween(-12, 0)
    wz = wd.rowsBetween(-52, -1)
    nl = F.col("net_liquidity")
    ma4 = ta.wavg(nl, w4)
    ma13 = ta.wavg(nl, w13)
    z = (nl - ta.wavg(nl, wz)) / F.nullif(ta.wstd(nl, wz), F.lit(0.0))

    def pct(n: int):
        return (
            (nl / F.nullif(F.lag(nl, n).over(wd), F.lit(0.0))) - 1
        ) * 100

    return combined.select(
        "date",
        "walcl",
        "wtregen",
        "rrpontsyd",
        "net_liquidity",
        "component_count",
        ma4.alias("net_liquidity_4w_avg"),
        ma13.alias("net_liquidity_13w_avg"),
        pct(4).alias("net_liquidity_4w_pct_change"),
        pct(13).alias("net_liquidity_13w_pct_change"),
        pct(52).alias("net_liquidity_52w_pct_change"),
        ta.emit(z, 2).alias("net_liquidity_zscore"),
        F.when((nl > ma4) & (ma4 > ma13), "expanding")
        .when((nl < ma4) & (ma4 < ma13), "contracting")
        .otherwise("mixed")
        .alias("net_liquidity_trend"),
        F.when(z < -2, "high")
        .when(z < -1, "medium")
        .when((nl < ma4) & (ma4 < ma13), "low")
        .otherwise("normal")
        .alias("net_liquidity_status"),
        F.when(
            F.col("rrpontsyd").isNotNull()
            & (F.col("rrpontsyd") < RRP_HIGH),
            "high",
        )
        .when(
            F.col("rrpontsyd").isNotNull()
            & (F.col("rrpontsyd") < RRP_MED),
            "medium",
        )
        .when(
            F.col("rrpontsyd").isNotNull()
            & (F.col("rrpontsyd") < RRP_LOW),
            "low",
        )
        .otherwise("normal")
        .alias("rrp_depletion_status"),
    ).orderBy("date")
