"""Driver-contract mirror: every declared query hash-matches its oracle.

Parametrized over the full registry; any query with an oracle is compared
row-for-row (order-insensitive, column-name-sorted) against DuckDB on the
same parquet tables. Queries without an oracle get a rows>=0 smoke check.
"""

from __future__ import annotations

import pytest

from economic_data_project_spark.registry import all_oracles, all_queries

from .conftest import SF_DIR, compare_with_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    fn = QUERIES[name]
    oracle = ORACLES.get(name)
    if oracle is None:
        df = fn(spark, SF_DIR)
        n = df.count()
        assert n >= 0
        return
    ok, msg = compare_with_oracle(spark, fn, oracle, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
