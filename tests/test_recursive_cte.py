"""The exact-EMA kernel vs Spark 4's native WITH RECURSIVE.

SURVEY.md §4 offers two routes for the reference's recursive-CTE EMA
(market_breadth_signals.sql:168-192): Spark 4 recursive CTE, or a
per-partition applyInPandas recursion. The engine ships the kernel (one
pass per entity, no N-iteration plan — the shape that scales: the native
CTE needs MAX RECURSION LEVEL ~= series length and iterates the plan once
per bar); this test proves both routes agree bit-for-bit on the same
input, so the choice is purely physical."""

from __future__ import annotations

from economic_data_project_spark.catalog import load_table
from economic_data_project_spark.registry import all_queries

from .conftest import SF_DIR


def test_kernel_equals_native_recursive_cte(spark):
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    native = spark.sql(
        """
        WITH RECURSIVE daily AS (
          SELECT l_returnflag AS flag,
                 to_date(l_shipdate) AS d,
                 CAST(SUM(CAST((l_extendedprice * (1 - l_discount))
                               AS DECIMAL(28,6))) AS DOUBLE) / 1e6 AS rev
          FROM lineitem
          WHERE to_date(l_shipdate) < DATE '1995-09-01'
          GROUP BY l_returnflag, to_date(l_shipdate)
        ),
        numbered AS (
          SELECT flag, d, rev,
                 ROW_NUMBER() OVER (PARTITION BY flag ORDER BY d) AS rn
          FROM daily
        ),
        ema MAX RECURSION LEVEL 10000 AS (
          SELECT flag, d, rev, rn, rev AS ema20, rev AS rma14
          FROM numbered WHERE rn = 1
          UNION ALL
          SELECT n.flag, n.d, n.rev, n.rn,
                 (2.0d / 21) * n.rev + (1.0d - 2.0d / 21) * e.ema20,
                 (1.0d / 14) * n.rev + (1.0d - 1.0d / 14) * e.rma14
          FROM numbered n JOIN ema e
            ON n.flag = e.flag AND n.rn = e.rn + 1
        )
        SELECT flag, d, rev, ema20, rma14 FROM ema
        """
    )
    native_rows = {
        (r.flag, str(r.d)): (r.ema20, r.rma14) for r in native.collect()
    }
    # EMA at bar t depends only on bars 1..t, so the kernel's output
    # restricted to the same date prefix must equal the native CTE run on
    # the truncated input (the prefix keeps the recursion depth ~250;
    # full-series native recursion takes ~7 min of plan iterations —
    # itself the argument for the kernel).
    kernel = all_queries()["ema_exact_recursive"](spark, SF_DIR)
    kernel_rows = {
        (r.flag, str(r.d)): (r.ema20, r.rma14)
        for r in kernel.collect()
        if str(r.d) < "1995-09-01"
    }
    assert kernel_rows == native_rows  # bit-for-bit, no tolerance
