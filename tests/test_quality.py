"""Assertion-pack tests (the dbt generic-test ports)."""

from __future__ import annotations

from economic_data_project_spark.quality.checks import (
    check_not_null,
    check_ohlc_consistency,
    check_positive,
    check_unique_combination,
    check_value_in_range,
)


def test_unique_combination(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["k1", "k2"]
    )
    bad = check_unique_combination(df, ["k1", "k2"]).collect()
    assert len(bad) == 1 and bad[0].n_rows == 2
    clean = spark.createDataFrame([(1, "a"), (2, "b")], ["k1", "k2"])
    assert check_unique_combination(clean, ["k1", "k2"]).count() == 0


def test_positive_and_range_and_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (0.0,), (-2.0,), (None,)], "v double"
    )
    assert check_positive(df, "v").count() == 3
    assert check_value_in_range(df, "v", -1.0, 1.0).count() == 1
    assert check_not_null(df, ["v"]).count() == 1


def test_ohlc_consistency(spark):
    df = spark.createDataFrame(
        [
            (10.0, 12.0, 9.0, 11.0),   # ok
            (10.0, 9.5, 9.0, 11.0),    # high < close
            (10.0, 12.0, 10.5, 11.0),  # low > open
        ],
        ["open", "high", "low", "close"],
    )
    assert check_ohlc_consistency(df).count() == 2
