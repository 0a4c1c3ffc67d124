"""BigQuery -> Spark dialect/function layer.

The reference leans on a handful of BigQuery idioms that have direct (often
cleaner) Spark equivalents. This module is the translation table from
SURVEY.md §2.8/§4 — `SAFE_DIVIDE`, `SAFE.LN`, `UNIX_DATE`,
`GENERATE_DATE_ARRAY`, `QUALIFY`-style dedup — implemented as native Column
expressions so everything stays inside whole-stage codegen (no Python UDFs).

Reference cites (for parity checking):
  SAFE_DIVIDE        dbt_project/macros/technical_analysis/ta_primitives.sql:62-65
  QUALIFY dedup      dbt_project/models/markets/technical/technical_price_universe.sql:79-82
  UNIX_DATE windows  dbt_project/macros/calculate_market_analysis_return.sql:89-103
  GENERATE_DATE_ARRAY dbt_project/models/semantic_layer/time_spine_daily.sql:3-10
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ColumnLike = Column | str


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_divide(num: ColumnLike, den: ColumnLike) -> Column:
    """BigQuery SAFE_DIVIDE: NULL on zero/NULL denominator."""
    return F.try_divide(_col(num), _col(den))


def safe_ln(x: ColumnLike) -> Column:
    """BigQuery SAFE.LN: NULL for non-positive input instead of error/NaN."""
    x = _col(x)
    return F.when(x > 0, F.log(x))


def unix_date(d: ColumnLike) -> Column:
    """Days since 1970-01-01 — the key for calendar RANGE window frames."""
    return F.datediff(_col(d), F.lit("1970-01-01"))


def date_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """GENERATE_DATE_ARRAY equivalent: one row per day in [start, end].

    ``sequence`` is evaluated on executors from a single-row frame, then
    exploded — at any scale this is a tiny side that should be broadcast
    when joined against facts.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date")
    )


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """QUALIFY ROW_NUMBER() OVER (...) = 1 rewrite.

    Spark has no QUALIFY clause; the mechanical rewrite keeps the same
    physical plan BigQuery would pick (window + filter, fully pipelined).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def approx_quantile(x: ColumnLike, q: float) -> Column:
    """BigQuery APPROX_QUANTILES(x, 100)[OFFSET(p)] equivalent.

    NOTE: for oracle-checked queries prefer exact ``F.percentile`` —
    approximate sketches are engine-specific and will not hash-match DuckDB.
    """
    return F.percentile_approx(_col(x), q)


def money(c: ColumnLike, scale: int = 6) -> Column:
    """Cast a double term to an exact decimal before summing.

    Floating-point summation order differs between Spark (partial/final
    partitions) and single-threaded oracles; casting each term to DECIMAL
    makes SUM exact and therefore bit-identical across engines. Scale 6
    absorbs price*(1-discount) style products.
    """
    return _col(c).cast(f"decimal(28,{scale})")


def money_sum(c: ColumnLike, scale: int = 6) -> Column:
    """Exact SUM of a double expression, returned as DOUBLE.

    decimal-sum -> double cast is deterministic in both Spark and DuckDB,
    which makes money aggregates hash-comparable across engines.
    """
    return F.sum(money(c, scale)).cast("double")


def rounded(c: Column, dp: int, alias: str | None = None) -> Column:
    """ROUND for float-fuzzy aggregates (stddev/corr) pre-oracle-compare.

    The reference rounds outputs aggressively (≈440 ROUND calls,
    SURVEY.md §2.8); the rebuild keeps the same convention so results are
    stable under engine-specific fp association.
    """
    out = F.round(c, dp)
    return out.alias(alias) if alias else out


def select_except(df: DataFrame, *except_cols: str) -> DataFrame:
    """BigQuery ``SELECT * EXCEPT (cols)``
    (technical_indicator_daily.sql:124,170,178) — Spark's ``drop`` with
    existence checking (silently dropping a typo'd column hides bugs)."""
    missing = [c for c in except_cols if c not in df.columns]
    if missing:
        raise KeyError(f"EXCEPT columns not present: {missing}")
    return df.drop(*except_cols)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side's key into ``salt``
    shards and replicate the (small) dim side across shards, so one hot
    key spreads over ``salt`` tasks instead of stalling a single reducer
    (SURVEY.md 'skewed keys -> salting or AQE skew-join'). Semantically
    identical to ``fact.join(dim, key, how)`` for inner/left joins.

    Use when AQE's skew splitting can't help (e.g. the skew is in a
    broadcast-ineligible aggregation-feeding join). The replicated side
    must be the small one — replication is x``salt``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_fact = fact.withColumn(
        "__salt", (F.rand(42) * salt).cast("int")
    )
    exploded_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    out = salted_fact.join(exploded_dim, [key, "__salt"], how)
    return out.drop("__salt")
