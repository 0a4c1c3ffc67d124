"""Cross-engine parity fuzz for the BigQuery-dialect translation layer.

Every oracle in the registry leans on these scalar mappings
(safe_divide/safe_ln/unix_date/money_sum — SURVEY.md §2.8 translation
table), so an edge-value divergence here would surface as opaque hash
mismatches all over the driver. This fuzz compares Spark and DuckDB on
one BATCHED frame (one Spark job, one DuckDB query — not a job per
example) over a deterministic edge battery plus seeded random values.

Parity scope follows the repo's float discipline (functions/ta.py):
- division, datediff, decimal-exact sums: IEEE/integer/decimal exact —
  compared bit-for-bit;
- ln: libm results may differ by 1 ulp across engines, so only the
  SAFE-semantics region (NULL iff x <= 0, finite otherwise) is asserted,
  not raw values — oracle queries must round ln-based outputs anyway.
"""

from __future__ import annotations

import datetime
import math
import random

import pandas as pd

from economic_data_project_spark.functions.dialect import (
    money_sum,
    safe_divide,
    safe_ln,
    unix_date,
)

from .conftest import _norm_cell

_EDGE = [0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 2.5, -2.5, 1e6, -1e6,
         1e-3, -1e-3, 123456.789, -98765.4321, 7.0, -7.0]
# dens avoid magnitudes that overflow num/den to inf (no IEEE-inf
# parity question to answer here; the engine never divides by 1e-300)
_DEN_EDGE = [0.0, -0.0, 1.0, -1.0, 2.0, -3.0, 0.5, 1e-3, -1e-3, 1e6]


def _battery() -> pd.DataFrame:
    rng = random.Random(0xD1A1EC7)
    nums = _EDGE + [rng.uniform(-1e6, 1e6) for _ in range(200)]
    dens = _DEN_EDGE + [
        0.0 if rng.random() < 0.1 else rng.uniform(-1e6, 1e6)
        for _ in range(len(nums) - len(_DEN_EDGE))
    ]
    xs = [rng.uniform(-1e6, 1e6) for _ in range(len(nums))]
    epoch = datetime.date(1970, 1, 1)
    days = [rng.randint(-40000, 40000) for _ in range(len(nums) - 4)]
    days += [0, -1, 11016, 18321]  # epoch, pre-epoch, leap-day spans
    return pd.DataFrame(
        {
            "idx": range(len(nums)),
            "num": nums,
            "den": dens,
            "x": xs,
            "d": [epoch + datetime.timedelta(days=k) for k in days],
        }
    )


def test_scalar_dialect_parity_battery(spark):
    import duckdb

    pdf = _battery()
    sdf = spark.createDataFrame(pdf)
    got = {
        r["idx"]: r
        for r in sdf.select(
            "idx",
            safe_divide("num", "den").alias("q"),
            safe_ln("x").alias("lnx"),
            unix_date("d").alias("ud"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        r[0]: r
        for r in con.execute(
            """
            SELECT idx,
                   CASE WHEN den = 0 THEN NULL ELSE num / den END AS q,
                   CASE WHEN x > 0 THEN ln(x) END AS lnx,
                   datediff('day', DATE '1970-01-01', d) AS ud
            FROM t
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for i in got:
        g, w = got[i], want[i]
        # division + date arithmetic: exact cross-engine parity
        assert _norm_cell(g["q"]) == _norm_cell(w[1]), (i, g, w)
        assert g["ud"] == w[3], (i, g, w)
        # ln: SAFE-region semantics only (1-ulp libm divergence allowed)
        if pdf["x"][i] <= 0:
            assert g["lnx"] is None and w[2] is None, (i, g, w)
        else:
            assert g["lnx"] is not None and math.isfinite(g["lnx"])
            assert w[2] is not None and abs(g["lnx"] - w[2]) <= 1e-12


def test_money_sum_decimal_exact_parity(spark):
    """SUM of doubles diverges across engines by partial-aggregation
    order; money_sum's decimal route must be bit-identical to DuckDB's
    decimal sum on the same terms — including a catastrophic-
    cancellation battery where plain double SUM visibly drifts."""
    import duckdb

    rng = random.Random(0x5EED5)
    terms = (
        [rng.uniform(-1e6, 1e6) for _ in range(500)]
        + [1e9, -1e9, 1e-6, -3e-6, 0.1] * 20
    )
    pdf = pd.DataFrame({"c": terms})
    got = (
        spark.createDataFrame(pdf)
        .repartition(16)  # force multi-partition partial aggregation
        .agg(money_sum("c").alias("s"))
        .collect()[0]["s"]
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        "SELECT CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    assert _norm_cell(got) == _norm_cell(want)
