"""Cross-asset divergence signals.

Mirror of ``dbt_project/models/signals/cross_asset_divergences.sql`` and
its ``int_cross_asset_credit_signals.sql`` /
``int_cross_asset_risk_confirmation_signals.sql`` components: SMA50/200
and 252-day-high context for the equity proxy, credit-proxy SMA50 and
spread 20d change, the two divergence flags (credit below trend while
equity above trend, :56-64; spread widening at equity 252d highs), a
defensive-ratio trend with uptrend flag, and the 252d rolling
stock/bond correlation with its sign regime (:88-120).

Series mapping: equity proxy = flag-N daily revenue, credit proxy =
flag-R daily revenue, high-yield spread = flag-A mean discount x 100,
defensive ratio = flag-A / flag-N revenue.

Spark-first deviation: the reference materializes five ``int_*`` models
and LEFT-JOINs them on date (cross_asset_divergences.sql:52-60) because
dbt draws model boundaries; here all families share one per-date pivot,
so the whole fan-in fuses into a single window pass over the date spine
— zero joins, one shuffle. The trailing as-of filter (CURRENT_DATE - 3
years) is dropped for oracle determinism.

Scale: one distributed hash-agg over lineitem -> ~thousands of date
rows; the unpartitioned windows run on that per-date aggregate (the
documented small-series window policy, matching the reference's
single-asset frames). Returns are rounded to 6dp before the decimal
windowed-corr sums so the casts are unambiguous cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import ta
from ..registry import query

DEC = "decimal(28,6)"
_REV = "l_extendedprice * (1 - l_discount)"


def _sql_rev(flag: str) -> str:
    return (
        f"CAST(SUM(CAST(CASE WHEN l_returnflag = '{flag}'"
        f" THEN {_REV} END AS DECIMAL(28,6))) AS DOUBLE) / 1e6"
    )


_W = "(ORDER BY d ROWS BETWEEN {n} PRECEDING AND CURRENT ROW)"

_ORACLE = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
    {_sql_rev("N")} AS spy_close,
    {_sql_rev("R")} AS hyg_close,
    (CAST(SUM(CASE WHEN l_returnflag = 'A'
                   THEN CAST(l_discount AS DECIMAL(28,6)) END) AS DOUBLE)
     / COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END)) * 100 AS hy_spread
  FROM lineitem GROUP BY 1
),
ind AS (
  SELECT d, spy_close, hyg_close, hy_spread,
    {ta.sql_wavg("spy_close", _W.format(n=49))} AS spy_sma_50,
    {ta.sql_wavg("spy_close", _W.format(n=199))} AS spy_sma_200,
    MAX(spy_close) OVER {_W.format(n=251)} AS spy_high_252d,
    {ta.sql_wavg("hyg_close", _W.format(n=49))} AS hyg_sma_50,
    hy_spread - LAG(hy_spread, 20) OVER (ORDER BY d)
      AS hy_spread_20d_change,
    (hyg_close / NULLIF(spy_close, 0)) AS def_ratio,
    {ta.sql_wavg("hyg_close / NULLIF(spy_close, 0)", _W.format(n=49))}
      AS def_ratio_sma_50,
    {ta.sql_wavg("hyg_close / NULLIF(spy_close, 0)", _W.format(n=199))}
      AS def_ratio_sma_200,
    ROUND(spy_close / NULLIF(LAG(spy_close) OVER (ORDER BY d), 0) - 1, 6)
      AS spy_ret,
    ROUND(hyg_close / NULLIF(LAG(hyg_close) OVER (ORDER BY d), 0) - 1, 6)
      AS hyg_ret
  FROM daily
),
corr AS (
  SELECT *,
    (CASE WHEN COUNT(spy_ret) OVER cw > 1 THEN
       ({ta.sql_wsum("spy_ret * hyg_ret", "cw")}
        - {ta.sql_wsum("spy_ret", "cw")} * {ta.sql_wsum("hyg_ret", "cw")}
          / COUNT(spy_ret) OVER cw)
       / NULLIF(SQRT(GREATEST(
           ({ta.sql_wsum("spy_ret * spy_ret", "cw")}
            - {ta.sql_wsum("spy_ret", "cw")} * {ta.sql_wsum("spy_ret", "cw")}
              / COUNT(spy_ret) OVER cw)
           * ({ta.sql_wsum("hyg_ret * hyg_ret", "cw")}
              - {ta.sql_wsum("hyg_ret", "cw")}
                * {ta.sql_wsum("hyg_ret", "cw")}
                / COUNT(spy_ret) OVER cw), 0.0)), 0) END)
      AS stock_bond_corr_252d
  FROM ind
  WINDOW cw AS (ORDER BY d ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)
)
SELECT d AS date, spy_close, spy_sma_50, spy_sma_200, spy_high_252d,
  hyg_close, hyg_sma_50, hy_spread, hy_spread_20d_change,
  CAST(CASE WHEN hyg_close < hyg_sma_50 AND spy_close > spy_sma_50
            THEN 1 ELSE 0 END AS BIGINT) AS hy_equity_divergence_flag,
  CAST(CASE WHEN hy_spread_20d_change > 0 AND spy_close >= spy_high_252d
            THEN 1 ELSE 0 END AS BIGINT) AS hy_spread_divergence_flag,
  stock_bond_corr_252d,
  (CASE WHEN stock_bond_corr_252d > 0 THEN 'positive'
        WHEN stock_bond_corr_252d IS NULL THEN NULL
        ELSE 'negative' END) AS stock_bond_corr_regime,
  def_ratio, def_ratio_sma_50, def_ratio_sma_200,
  CAST(CASE WHEN def_ratio > def_ratio_sma_50
             AND def_ratio_sma_50 > def_ratio_sma_200
            THEN 1 ELSE 0 END AS BIGINT)
    AS defensive_ratio_uptrend_flag
FROM corr
ORDER BY date
"""


@query("cross_asset_divergences", oracle=_ORACLE)
def cross_asset_divergences(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)

    def frev(flag: str):
        return (
            F.sum(F.when(F.col("l_returnflag") == flag, rev)).cast("double")
            / F.lit(1e6)
        )

    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        frev("N").alias("spy_close"),
        frev("R").alias("hyg_close"),
        (
            F.sum(
                F.when(
                    F.col("l_returnflag") == "A",
                    F.col("l_discount").cast(DEC),
                )
            ).cast("double")
            / F.count(F.when(F.col("l_returnflag") == "A", F.lit(1)))
            * 100
        ).alias("hy_spread"),
    )

    wd = Window.orderBy("d")

    def roll(n: int):
        return wd.rowsBetween(-(n - 1), 0)

    ratio = F.col("hyg_close") / F.nullif(F.col("spy_close"), F.lit(0))
    ind = daily.select(
        "*",
        ta.wavg("spy_close", roll(50)).alias("spy_sma_50"),
        ta.wavg("spy_close", roll(200)).alias("spy_sma_200"),
        F.max("spy_close").over(roll(252)).alias("spy_high_252d"),
        ta.wavg("hyg_close", roll(50)).alias("hyg_sma_50"),
        (F.col("hy_spread") - F.lag("hy_spread", 20).over(wd)).alias(
            "hy_spread_20d_change"
        ),
        ratio.alias("def_ratio"),
        ta.wavg(ratio, roll(50)).alias("def_ratio_sma_50"),
        ta.wavg(ratio, roll(200)).alias("def_ratio_sma_200"),
        F.round(
            F.col("spy_close")
            / F.nullif(F.lag("spy_close").over(wd), F.lit(0))
            - 1,
            6,
        ).alias("spy_ret"),
        F.round(
            F.col("hyg_close")
            / F.nullif(F.lag("hyg_close").over(wd), F.lit(0))
            - 1,
            6,
        ).alias("hyg_ret"),
    )

    cw = roll(252)
    x, y = F.col("spy_ret"), F.col("hyg_ret")
    n = F.count(x).over(cw)
    sx, sy = ta.wsum(x, cw), ta.wsum(y, cw)
    sxx, syy, sxy = (
        ta.wsum(x * x, cw),
        ta.wsum(y * y, cw),
        ta.wsum(x * y, cw),
    )
    corr = F.when(
        n > 1,
        (sxy - sx * sy / n)
        / F.nullif(
            F.sqrt(
                F.greatest(
                    (sxx - sx * sx / n) * (syy - sy * sy / n), F.lit(0.0)
                )
            ),
            F.lit(0),
        ),
    )
    out = ind.select(
        "*", corr.alias("stock_bond_corr_252d")
    )
    return out.select(
        F.col("d").alias("date"),
        "spy_close",
        "spy_sma_50",
        "spy_sma_200",
        "spy_high_252d",
        "hyg_close",
        "hyg_sma_50",
        "hy_spread",
        "hy_spread_20d_change",
        F.when(
            (F.col("hyg_close") < F.col("hyg_sma_50"))
            & (F.col("spy_close") > F.col("spy_sma_50")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("hy_equity_divergence_flag"),
        F.when(
            (F.col("hy_spread_20d_change") > 0)
            & (F.col("spy_close") >= F.col("spy_high_252d")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("hy_spread_divergence_flag"),
        "stock_bond_corr_252d",
        F.when(F.col("stock_bond_corr_252d") > 0, "positive")
        .when(F.col("stock_bond_corr_252d").isNull(), F.lit(None))
        .otherwise("negative")
        .alias("stock_bond_corr_regime"),
        "def_ratio",
        "def_ratio_sma_50",
        "def_ratio_sma_200",
        F.when(
            (F.col("def_ratio") > F.col("def_ratio_sma_50"))
            & (F.col("def_ratio_sma_50") > F.col("def_ratio_sma_200")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("defensive_ratio_uptrend_flag"),
    ).orderBy("date")
