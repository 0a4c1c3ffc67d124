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

    wd = ta.series_window("d")

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


# --------------------------------------------------------------------------
# Rolling-OLS residual kernel (int_cross_asset_commodity_signals.sql:14-105):
# 252d rolling linear regression of the commodity price on the real
# yield via windowed moment averages (beta = (E[xy]-E[x]E[y]) /
# (E[x^2]-E[x]^2)), the regression residual, its rolling z-score, and
# the 252d copper/gold-ratio-vs-yield rolling correlation. A rolling
# regression is the one kernel the cross-asset stack adds beyond
# SMA/corr — expressed entirely as decimal-exact windowed sums.
# Series mapping: gold = flag-N daily revenue, real yield = flag-A mean
# discount x 100, copper = flag-R daily revenue, treasury yield = mean
# tax x 100.
# --------------------------------------------------------------------------

_ROLL = "(ORDER BY date ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)"


def _ols_oracle() -> str:
    ax = ta.sql_wavg("real_yield_10y", _ROLL)
    ay = ta.sql_wavg("gold_price", _ROLL)
    axy = ta.sql_wavg("real_yield_10y * gold_price", _ROLL)
    ax2 = ta.sql_wavg("real_yield_10y * real_yield_10y", _ROLL)
    res = "CASE WHEN beta IS NOT NULL AND alpha IS NOT NULL" \
          " THEN gold_price - (alpha + beta * real_yield_10y) END"
    ravg = ta.sql_wavg(res, "w")
    rstd = ta.sql_wstd(res, "w")
    n = "COUNT(copper_gold_ratio) OVER w"
    sx = ta.sql_wsum("copper_gold_ratio", "w")
    sy = ta.sql_wsum("treasury_10y_yield", "w")
    sxx = ta.sql_wsum("copper_gold_ratio * copper_gold_ratio", "w")
    syy = ta.sql_wsum("treasury_10y_yield * treasury_10y_yield", "w")
    sxy = ta.sql_wsum("copper_gold_ratio * treasury_10y_yield", "w")
    return f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS date,
    {_sql_rev("N")} AS gold_price,
    {_sql_rev("R")} AS copper_price,
    (CAST(SUM(CASE WHEN l_returnflag = 'A'
                   THEN CAST(l_discount AS DECIMAL(28,6)) END) AS DOUBLE)
     / COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END)) * 100
      AS real_yield_10y,
    (CAST(SUM(CAST(l_tax AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)) * 100
      AS treasury_10y_yield
  FROM lineitem GROUP BY 1
),
reg AS (
  SELECT date, gold_price, copper_price, real_yield_10y,
         treasury_10y_yield,
    {ax} AS avg_x, {ay} AS avg_y, {axy} AS avg_xy, {ax2} AS avg_x2
  FROM daily
),
fitted AS (
  SELECT *,
    (CASE WHEN (avg_x2 - avg_x * avg_x) != 0
          THEN (avg_xy - avg_x * avg_y) / (avg_x2 - avg_x * avg_x) END)
      AS beta,
    (CASE WHEN (avg_x2 - avg_x * avg_x) != 0
          THEN avg_y - ((avg_xy - avg_x * avg_y)
                        / (avg_x2 - avg_x * avg_x)) * avg_x END)
      AS alpha,
    (copper_price / NULLIF(gold_price, 0)) * 1000 AS copper_gold_ratio
  FROM reg
),
rolled AS (
  SELECT *,
    ({res}) AS gold_real_residual,
    {ravg} AS residual_avg,
    {rstd} AS residual_std,
    (CASE WHEN {n} > 1 THEN ({sxy} - {sx} * {sy} / {n})
       / NULLIF(SQRT(GREATEST(({sxx} - {sx} * {sx} / {n})
           * ({syy} - {sy} * {sy} / {n}), 0.0)), 0) END)
      AS copper_gold_yield_corr_252d
  FROM fitted
  WINDOW w AS (ORDER BY date ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)
)
SELECT date, gold_price, real_yield_10y,
  (ROUND(beta, 9) + 0.0) AS beta, (ROUND(alpha, 9) + 0.0) AS alpha,
  (ROUND(gold_real_residual, 9) + 0.0) AS gold_real_residual,
  (ROUND((CASE WHEN residual_std > 0
        THEN (gold_real_residual - residual_avg) / residual_std END), 9)
    + 0.0) AS gold_real_residual_zscore,
  copper_gold_ratio, treasury_10y_yield,
  (ROUND(copper_gold_yield_corr_252d, 9) + 0.0)
    AS copper_gold_yield_corr_252d
FROM rolled
ORDER BY date
"""


@query("commodity_real_residual", oracle=_ols_oracle())
def commodity_real_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)

    def frev(flag: str):
        return (
            F.sum(F.when(F.col("l_returnflag") == flag, rev)).cast(
                "double"
            )
            / F.lit(1e6)
        )

    daily = li.groupBy(F.to_date("l_shipdate").alias("date")).agg(
        frev("N").alias("gold_price"),
        frev("R").alias("copper_price"),
        (
            F.sum(
                F.when(
                    F.col("l_returnflag") == "A",
                    F.col("l_discount").cast(DEC),
                )
            ).cast("double")
            / F.count(F.when(F.col("l_returnflag") == "A", F.lit(1)))
            * 100
        ).alias("real_yield_10y"),
        (
            F.sum(F.col("l_tax").cast(DEC)).cast("double")
            / F.count("*")
            * 100
        ).alias("treasury_10y_yield"),
    )
    w = ta.series_window("date").rowsBetween(-251, 0)
    x, y = F.col("real_yield_10y"), F.col("gold_price")
    reg = daily.select(
        "*",
        ta.wavg(x, w).alias("avg_x"),
        ta.wavg(y, w).alias("avg_y"),
        ta.wavg(x * y, w).alias("avg_xy"),
        ta.wavg(x * x, w).alias("avg_x2"),
    )
    var_x = F.col("avg_x2") - F.col("avg_x") * F.col("avg_x")
    beta = F.when(
        var_x != 0,
        (F.col("avg_xy") - F.col("avg_x") * F.col("avg_y")) / var_x,
    )
    alpha = F.when(
        var_x != 0,
        F.col("avg_y")
        - (F.col("avg_xy") - F.col("avg_x") * F.col("avg_y"))
        / var_x
        * F.col("avg_x"),
    )
    fitted = reg.select(
        "*",
        beta.alias("beta"),
        alpha.alias("alpha"),
        (
            (F.col("copper_price") / F.nullif(y, F.lit(0))) * 1000
        ).alias("copper_gold_ratio"),
    )
    res = F.when(
        F.col("beta").isNotNull() & F.col("alpha").isNotNull(),
        y - (F.col("alpha") + F.col("beta") * x),
    )
    cg, ty = F.col("copper_gold_ratio"), F.col("treasury_10y_yield")
    n = F.count(cg).over(w)
    sx, sy = ta.wsum(cg, w), ta.wsum(ty, w)
    sxx, syy, sxy = (
        ta.wsum(cg * cg, w),
        ta.wsum(ty * ty, w),
        ta.wsum(cg * ty, w),
    )
    corr = F.when(
        n > 1,
        (sxy - sx * sy / n)
        / F.nullif(
            F.sqrt(
                F.greatest(
                    (sxx - sx * sx / n) * (syy - sy * sy / n),
                    F.lit(0.0),
                )
            ),
            F.lit(0),
        ),
    )
    rolled = fitted.select(
        "*",
        res.alias("gold_real_residual"),
        ta.wavg(res, w).alias("residual_avg"),
        ta.wstd(res, w).alias("residual_std"),
        corr.alias("copper_gold_yield_corr_252d"),
    )
    # Derived regression/corr outputs rounded to 9dp on BOTH sides:
    # windowed sums of messy products can land on decimal-cast ties
    # where the engines' half-rounding disagrees by 1 ulp.
    return rolled.select(
        "date",
        "gold_price",
        "real_yield_10y",
        (F.round("beta", 9) + F.lit(0.0)).alias("beta"),
        (F.round("alpha", 9) + F.lit(0.0)).alias("alpha"),
        (F.round("gold_real_residual", 9) + F.lit(0.0)).alias(
            "gold_real_residual"
        ),
        (
            F.round(
                F.when(
                    F.col("residual_std") > 0,
                    (F.col("gold_real_residual") - F.col("residual_avg"))
                    / F.col("residual_std"),
                ),
                9,
            )
            + F.lit(0.0)
        ).alias("gold_real_residual_zscore"),
        "copper_gold_ratio",
        "treasury_10y_yield",
        (F.round("copper_gold_yield_corr_252d", 9) + F.lit(0.0)).alias(
            "copper_gold_yield_corr_252d"
        ),
    ).orderBy("date")
