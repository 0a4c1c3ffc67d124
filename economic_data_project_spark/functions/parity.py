"""Cross-engine deterministic aggregate helpers.

Floating-point SUM/AVG/STDDEV/CORR are association-sensitive: Spark's
partial->final hash aggregation and DuckDB's single-threaded (or
segment-tree windowed) execution add doubles in different orders, so raw
double aggregates differ in the last ulps and fail a value-hash oracle.

The fix used throughout this engine (and by every oracle-checked query):

- SUM: cast each term to DECIMAL first. Decimal addition is associative and
  exact in both engines, and the final DECIMAL->DOUBLE cast is the IEEE
  nearest double, so the result is bit-identical. On a 1000-executor
  cluster this also makes partial aggregation reproducible run-to-run.
- AVG: exact decimal sum (as double) divided by COUNT — a single IEEE
  division, deterministic.
- STDDEV/VAR/CORR: computed from exact sums via the textbook identities
  ((Σx² − (Σx)²/n)/(n−1), etc.) with an identical double expression tree on
  both engines. Equivalent SQL generators are provided for the DuckDB
  oracle side so the expression shape matches operation-for-operation.

Reference parity note: the reference rounds all published metrics to 2-6 dp
(≈440 ROUND calls, SURVEY.md §2.8) precisely because BigQuery float
aggregation is similarly order-unstable; this module makes rounding a
belt-and-suspenders measure instead of a correctness requirement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------- Spark side


def dsum(c: Column | str) -> Column:
    """Exact (decimal-accumulated) SUM of a double expression, as DOUBLE."""
    return F.sum(_c(c).cast(DEC)).cast("double")


def davg(c: Column | str, dp: int = 6) -> Column:
    """Deterministic AVG: exact sum / count, rounded to ``dp``."""
    x = _c(c)
    return F.round(dsum(x) / F.count(x), dp)


def dvar_samp(c: Column | str, dp: int = 6) -> Column:
    """Deterministic sample variance from exact sums."""
    x = _c(c)
    n = F.count(x).cast("double")
    sx = dsum(x)
    sxx = dsum(x * x)
    return F.round((sxx - sx * sx / n) / (n - F.lit(1.0)), dp)


def dstddev_samp(c: Column | str, dp: int = 6) -> Column:
    """Deterministic sample stddev from exact sums."""
    x = _c(c)
    n = F.count(x).cast("double")
    sx = dsum(x)
    sxx = dsum(x * x)
    return F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))), dp)


def dcorr(x: Column | str, y: Column | str, dp: int = 6) -> Column:
    """Deterministic Pearson correlation from exact sums."""
    x, y = _c(x), _c(y)
    n = F.count(F.lit(1)).cast("double")
    sx, sy = dsum(x), dsum(y)
    sxx, syy, sxy = dsum(x * x), dsum(y * y), dsum(x * y)
    num = sxy - sx * sy / n
    den = F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return F.round(num / den, dp)


# --------------------------------------------------- DuckDB-oracle SQL side
# String generators producing the operation-for-operation equivalent ANSI
# SQL, so the double expression trees match the Spark side exactly.


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str, dp: int = 6) -> str:
    return f"ROUND({sql_dsum(expr)} / COUNT({expr}), {dp})"


def sql_dvar_samp(expr: str, dp: int = 6) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = sql_dsum(expr)
    sxx = sql_dsum(f"({expr}) * ({expr})")
    return f"ROUND(({sxx} - {sx} * {sx} / {n}) / ({n} - 1.0), {dp})"


def sql_dstddev_samp(expr: str, dp: int = 6) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = sql_dsum(expr)
    sxx = sql_dsum(f"({expr}) * ({expr})")
    return f"ROUND(SQRT(({sxx} - {sx} * {sx} / {n}) / ({n} - 1.0)), {dp})"


def sql_dcorr(x: str, y: str, dp: int = 6) -> str:
    n = "CAST(COUNT(1) AS DOUBLE)"
    sx, sy = sql_dsum(x), sql_dsum(y)
    sxx, syy = sql_dsum(f"({x}) * ({x})"), sql_dsum(f"({y}) * ({y})")
    sxy = sql_dsum(f"({x}) * ({y})")
    num = f"({sxy} - {sx} * {sy} / {n})"
    den = f"SQRT(({sxx} - {sx} * {sx} / {n}) * ({syy} - {sy} * {sy} / {n}))"
    return f"ROUND({num} / {den}, {dp})"
