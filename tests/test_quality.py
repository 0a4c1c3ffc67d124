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


def test_schema_test_engine(spark):
    """The declarative runner reports per-test violation counts: a clean
    table passes, seeded defects fail with exact counts."""
    from unittest import mock

    from economic_data_project_spark.quality import schema_tests as st

    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    child = spark.createDataFrame(
        [
            (1, "A", 5.0, 1),
            (1, "A", -1.0, 2),   # dup grain + nonpositive
            (None, "Z", 3.0, 1),  # null key + bad enum
            (3, "B", 999.0, 9),  # orphan fk + out of range
        ],
        "k bigint, cat string, v double, fk bigint",
    )
    spec = {
        "child": {
            "not_null": ["k"],
            "unique": [["k", "cat"]],
            "accepted_values": {"cat": ["A", "B"]},
            "value_in_range": {"v": (0.0, 100.0)},
            "positive": ["v"],
            "relationships": [("fk", "parent", "pk")],
        }
    }
    with mock.patch.object(st, "SCHEMA_TESTS", spec):
        out = {
            (r.model, r.column, r.test_name): (r.n_violations, r.status)
            for r in st.run_schema_tests(
                spark, {"child": child, "parent": parent}
            ).collect()
        }
    assert out[("child", "k", "not_null")] == (1, "fail")
    assert out[("child", "k, cat", "unique")] == (1, "fail")
    assert out[("child", "cat", "accepted_values")] == (1, "fail")
    assert out[("child", "v", "value_in_range")] == (2, "fail")
    assert out[("child", "v", "positive")] == (1, "fail")
    assert out[("child", "fk", "relationships")] == (1, "fail")


def test_hash_gate_sampling_monotone(spark):
    """Hash-gate property: raising a stratum's rate only ADDS rows —
    sample(r1) is a subset of sample(r2) for r1 < r2, because inclusion
    is a fixed hash-prefix compare against a growing threshold. This is
    the reproducibility contract seeded sampleBy cannot give."""
    from unittest import mock

    from pyspark.sql import functions as F

    from economic_data_project_spark.text import sampling as sm

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(10).alias("n_chars"),
    )

    def ids(rate):
        with mock.patch.object(sm, "STRATA", [("en", rate), ("other", 1.0)]):
            gate = sm._gate_col()
            rate_col = sm._rate_col()
            return {
                r.doc_id
                for r in docs.select("doc_id", "lang")
                .where(gate)
                .collect()
            }

    small, big = ids(0.2), ids(0.6)
    assert small <= big
    assert len(small) < len(big) < 500
