"""Technical-analysis primitive library — the Spark mirror of
``dbt_project/macros/technical_analysis/ta_primitives.sql``.

Each helper returns a Column (or a small builder) over a caller-supplied
window spec, so indicators compose exactly like the reference's Jinja
macros compose in SQL. Conventions shared with the oracle layer:

- rolling sums/means/stddevs go through decimal-exact windowed sums
  (functions/parity.py rationale) so they hash-match DuckDB;
- EWM uses the reference's *finite-window array* formulation
  (ta_primitives.sql:84-126): collect the trailing window, dot it with
  literal (1-alpha)^offset weights, normalize. Weights are Python-computed
  literals — pow() is libm-territory, literals are not;
- everything is a JVM-side expression (window + higher-order functions);
  zero Python UDFs, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

DEC = "decimal(28,6)"


def series_window(*order_cols) -> WindowSpec:
    """Global-series window with an explicit single-partition key.

    A macro series has ONE global date order, so its windows are
    single-partition BY DESIGN — these frames are date-grain aggregates
    (hundreds to thousands of rows at any corpus scale), not fact
    tables. ``Window.orderBy(...)`` expresses that with an EMPTY
    partition spec, which makes WindowExec log 'No Partition Defined'
    on every run; that warning does real work elsewhere (it flags
    fact-scale frames that accidentally lost their key), so hot paths
    should not cry wolf with it. The key here is
    ``spark_partition_id() * 0``: constant 0 on every row (same single
    partition, bit-identical results) but non-foldable, so Catalyst
    keeps it in the partition spec and the plan states the bounded
    single-partition intent explicitly. Use ONLY downstream of a
    bounding aggregate."""
    return Window.partitionBy(
        F.spark_partition_id() * F.lit(0)
    ).orderBy(*order_cols)


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def wsum(c: Column | str, w) -> Column:
    """Windowed decimal-exact SUM as double."""
    return F.sum(_c(c).cast(DEC)).over(w).cast("double")


def wavg(c: Column | str, w) -> Column:
    """Windowed mean from exact sum (the SMA primitive)."""
    x = _c(c)
    return wsum(x, w) / F.count(x).over(w)


def wstd(c: Column | str, w) -> Column:
    """Windowed sample stddev from exact sums (sum-of-squares identity —
    deterministic because both sums are exact decimals)."""
    x = _c(c)
    n = F.count(x).over(w)
    s = wsum(x, w)
    ss = wsum(x * x, w)
    return F.when(
        n > 1,
        F.sqrt(
            F.greatest((ss - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))
        ),
    )


def dec_sq(c: Column | str, scale: int, width: int = 16) -> Column:
    """EXACT decimal square of a ``scale``-dp-rounded double.

    ``ROUND(x, p)`` leaves a double within half an ulp of ``k/10^p``;
    casting it to DECIMAL(width, p) recovers k exactly, and the decimal
    product ``k^2/10^(2p)`` is exact. Casting the double square
    ``x*x`` to DECIMAL(.., 6) instead re-rounds a 2p-dp value at 6dp,
    where Spark (exact BigDecimal HALF_UP) and DuckDB (scaled-double
    llround) can disagree near the boundary — the 1e-9 drift class seen
    in realized_vol_30d. Keep width+scale small enough that the square's
    precision (2*width+1) stays under 38 on both engines."""
    d = _c(c).cast(f"decimal({width},{scale})")
    return d * d


def wsum_raw(c: Column, w) -> Column:
    """Windowed SUM of an already-exact decimal column, as double."""
    return F.sum(c).over(w).cast("double")


def wstd_exact(c: Column | str, w, scale: int = 6) -> Column:
    """wstd for a ``scale``-dp-rounded input: the sum of squares goes
    through dec_sq so no re-rounding happens (see dec_sq)."""
    x = _c(c)
    n = F.count(x).over(w)
    s = wsum(x, w)
    ss = wsum_raw(dec_sq(x, scale), w)
    return F.when(
        n > 1,
        F.sqrt(
            F.greatest((ss - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))
        ),
    )


def emit(c: Column | str, dp: int = 6) -> Column:
    """Emission normalizer for double output columns that must hash-match
    a DuckDB oracle. ROUND(x, dp) absorbs the 1-ulp drift class where
    DuckDB casts a wide-scale exact decimal sum to double in two
    roundings (int128 -> double, then /10^scale) while the JVM's
    BigDecimal.doubleValue is correctly rounded; ``+ 0.0`` collapses
    IEEE signed zero (DuckDB's ROUND propagates -0.0, Spark's does
    not). Both engines then produce the identical double except when
    the true value lies within ~1 ulp of a half-ulp-of-10^-dp
    boundary. Use on EMITTED columns only — comparisons/CASE ladders
    should keep the unrounded value."""
    return F.round(_c(c), dp) + F.lit(0.0)


def sql_emit(expr: str, dp: int = 6) -> str:
    """DuckDB twin of :func:`emit`."""
    return f"(ROUND({expr}, {dp}) + 0.0)"


def zscore(c: Column | str, w) -> Column:
    """Rolling z-score (ta_primitives.sql:60-66)."""
    x = _c(c)
    return F.when(
        F.count(x).over(w) > 1,
        (x - wavg(x, w)) / F.nullif(wstd(x, w), F.lit(0)),
    )


def range_position(c: Column | str, w) -> Column:
    """(x - rolling_min) / (rolling_max - rolling_min), in [0, 1]
    (ta_primitives.sql:69-81 — the stochastic/WilliamsR core)."""
    x = _c(c)
    lo = F.min(x).over(w)
    hi = F.max(x).over(w)
    return (x - lo) / F.nullif(hi - lo, F.lit(0))


def ewm_weights(alpha: float, n: int) -> list[float]:
    """(1-alpha)^offset literals, offset 0 = newest bar."""
    return [(1.0 - alpha) ** j for j in range(n)]


def _w_array_sql(weights: list[float]) -> str:
    return "array(" + ", ".join(f"{x!r}D" for x in weights) + ")"


def ewm_from_array(win_col: str, alpha: float, n: int) -> Column:
    """Finite-window EWM over a collected trailing window column
    (ta_primitives.sql:84-126). ``win_col`` must be collect_list over a
    ROWS BETWEEN n-1 PRECEDING frame; newest element is last. Tail weight
    beyond the window is < (1-alpha)^n (the reference documents <2% for
    its spans, ta_primitives.sql:104-109)."""
    wa = _w_array_sql(ewm_weights(alpha, n))
    num = (
        f"aggregate(transform({win_col}, (v, i) ->"
        f" v * element_at({wa}, size({win_col}) - i)),"
        f" 0D, (acc, x) -> acc + x)"
    )
    den = (
        f"aggregate(transform({win_col}, (v, i) ->"
        f" element_at({wa}, size({win_col}) - i)),"
        f" 0D, (acc, x) -> acc + x)"
    )
    # Rounded to 9 dp: DuckDB's compiled list lambdas may contract the
    # mul+add into an FMA, drifting the fold by 1 ulp vs the JVM — the
    # one place the identical-op-order contract doesn't hold.
    return F.round(F.expr(f"({num}) / ({den})"), 9)


def mean_abs_dev(win_col: str, ref: str) -> Column:
    """Mean absolute deviation of a collected window from a reference
    column (ta_primitives.sql:129-136 — the CCI denominator). ``ref`` is
    a column NAME so it can appear inside the lambda expression."""
    total = F.expr(
        f"aggregate(transform({win_col}, v -> abs(v - {ref})),"
        f" 0D, (acc, x) -> acc + x)"
    )
    return total / F.expr(f"size({win_col})")


def true_range(
    high: Column | str, low: Column | str, prev_close: Column | str
) -> Column:
    """ATR's TR = max(high-low, |high-prev_close|, |low-prev_close|)."""
    h, lo, pc = _c(high), _c(low), _c(prev_close)
    return F.when(
        pc.isNotNull(),
        F.greatest(h - lo, F.abs(h - pc), F.abs(lo - pc)),
    ).otherwise(h - lo)


# ---------------------------------------------------------------- oracle SQL


def sql_wsum(expr: str, over: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) OVER {over} AS DOUBLE)"


def sql_wavg(expr: str, over: str) -> str:
    return f"({sql_wsum(expr, over)} / COUNT({expr}) OVER {over})"


def sql_wstd(expr: str, over: str) -> str:
    n = f"COUNT({expr}) OVER {over}"
    s = sql_wsum(expr, over)
    ss = sql_wsum(f"({expr}) * ({expr})", over)
    return (
        f"(CASE WHEN {n} > 1 THEN SQRT(GREATEST(({ss} - {s} * {s} / {n})"
        f" / ({n} - 1.0), 0.0)) END)"
    )


def sql_dec_sq(expr: str, scale: int, width: int = 16) -> str:
    """DuckDB twin of dec_sq (exact decimal square)."""
    d = f"CAST(({expr}) AS DECIMAL({width},{scale}))"
    return f"({d} * {d})"


def sql_wsum_raw(expr: str, over: str) -> str:
    return f"CAST(SUM({expr}) OVER {over} AS DOUBLE)"


def sql_wstd_exact(expr: str, over: str, scale: int = 6) -> str:
    n = f"COUNT({expr}) OVER {over}"
    s = sql_wsum(expr, over)
    ss = sql_wsum_raw(sql_dec_sq(expr, scale), over)
    return (
        f"(CASE WHEN {n} > 1 THEN SQRT(GREATEST(({ss} - {s} * {s} / {n})"
        f" / ({n} - 1.0), 0.0)) END)"
    )


def sql_ewm_from_array(win: str, alpha: float, n: int) -> str:
    """DuckDB twin of ewm_from_array (1-based list indexing)."""
    wa = "[" + ", ".join(
        f"CAST({x!r} AS DOUBLE)" for x in ewm_weights(alpha, n)
    ) + "]"
    num = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform({win}, (v, i) -> v * ({wa})[len({win}) - i + 1])),"
        f" (a, b) -> a + b)"
    )
    den = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform({win}, (v, i) -> ({wa})[len({win}) - i + 1])),"
        f" (a, b) -> a + b)"
    )
    return f"ROUND(({num}) / ({den}), 9)"


def sql_mean_abs_dev(win: str, ref: str) -> str:
    total = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform({win}, v -> abs(v - {ref}))), (a, b) -> a + b)"
    )
    return f"(({total}) / len({win}))"
