"""Direct unit tests for the TA primitive library (functions/ta.py)
against hand-computed pandas references — the indicator battery covers
composition; these pin each primitive in isolation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from economic_data_project_spark.functions import ta


@pytest.fixture(scope="module")
def series(spark):
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 18.0, 17.0, 16.0, 20.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["i", "x"]
    )
    return df, pd.Series(vals)


def _w(n):
    return Window.orderBy("i").rowsBetween(-(n - 1), 0)


def test_wavg_wstd_match_pandas(spark, series):
    df, s = series
    out = df.select(
        "i",
        ta.wavg("x", _w(4)).alias("avg"),
        ta.wstd("x", _w(4)).alias("std"),
    ).orderBy("i").collect()
    ref_avg = s.rolling(4, min_periods=1).mean()
    ref_std = s.rolling(4, min_periods=2).std()
    for r in out:
        assert r.avg == pytest.approx(ref_avg[r.i], abs=1e-12)
        if r.i >= 1:
            assert r.std == pytest.approx(ref_std[r.i], abs=1e-12)
        else:
            assert r.std is None


def test_zscore_and_range_position(spark, series):
    df, s = series
    out = df.select(
        "i",
        ta.zscore("x", _w(5)).alias("z"),
        ta.range_position("x", _w(5)).alias("rp"),
    ).orderBy("i").collect()
    m = s.rolling(5, min_periods=1).mean()
    sd = s.rolling(5, min_periods=2).std()
    lo = s.rolling(5, min_periods=1).min()
    hi = s.rolling(5, min_periods=1).max()
    for r in out[1:]:
        assert r.z == pytest.approx((s[r.i] - m[r.i]) / sd[r.i], abs=1e-10)
        width = hi[r.i] - lo[r.i]
        if width:
            assert r.rp == pytest.approx(
                (s[r.i] - lo[r.i]) / width, abs=1e-12
            )
        else:
            assert r.rp is None
    assert 0.0 <= out[5].rp <= 1.0


def test_ewm_from_array_matches_weighted_sum(spark, series):
    df, s = series
    n, alpha = 5, 0.4
    arr = df.withColumn(
        "win", F.collect_list("x").over(_w(n))
    )
    out = (
        arr.select("i", ta.ewm_from_array("win", alpha, n).alias("e"))
        .orderBy("i")
        .collect()
    )
    w = ta.ewm_weights(alpha, n)
    for r in out:
        window = s[max(0, r.i - n + 1) : r.i + 1].tolist()
        num = sum(
            v * w[len(window) - 1 - j] for j, v in enumerate(window)
        )
        den = sum(w[len(window) - 1 - j] for j in range(len(window)))
        assert r.e == pytest.approx(round(num / den, 9), abs=1e-9)


def test_true_range(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 8.0, None), (2, 11.0, 9.5, 8.2), (3, 9.0, 7.0, 11.5)],
        ["i", "high", "low", "prev_close"],
    )
    out = {
        r.i: r.tr
        for r in df.select(
            "i", ta.true_range("high", "low", "prev_close").alias("tr")
        ).collect()
    }
    assert out[1] == 2.0  # no prev close -> high-low
    assert out[2] == pytest.approx(2.8)  # |high - prev_close| wins
    assert out[3] == pytest.approx(4.5)  # |low - prev_close| wins


def test_mean_abs_dev(spark):
    df = spark.createDataFrame([(1.0,)], ["ref"]).select(
        "ref", F.expr("array(1.0D, 2.0D, 4.0D)").alias("win")
    )
    out = df.select(ta.mean_abs_dev("win", "ref").alias("mad")).collect()
    assert out[0].mad == pytest.approx((0 + 1 + 3) / 3)


def test_emit_matches_sql_emit_cross_engine(spark):
    """ta.emit (Spark) and ta.sql_emit (DuckDB) must produce the
    identical normalized double for the same input — including signed
    zero and values near ROUND half-boundaries (the two drift classes
    emit exists to kill)."""
    import duckdb

    rng = np.random.RandomState(7)
    vals = [float(v) for v in rng.uniform(-1e4, 1e4, 200)]
    vals += [-0.0, 0.0, 378.5610213708781, 378.56102137087817]
    vals += [5.0768795, -5.0768795, 1e-7, -1e-7, 123.4567895]

    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["i", "x"]
    )
    got_spark = {
        r.i: r.e
        for r in sdf.select("i", ta.emit("x").alias("e")).collect()
    }
    con = duckdb.connect()
    con.register(
        "vals_tbl",
        pd.DataFrame({"i": range(len(vals)), "x": vals}),
    )
    got_duck = dict(
        con.execute(
            "SELECT i, " + ta.sql_emit("x") + " AS e FROM vals_tbl"
        ).fetchall()
    )
    con.close()
    for i in range(len(vals)):
        s, d = got_spark[i], got_duck[i]
        assert repr(s) == repr(d), (i, vals[i], s, d)  # catches -0.0
