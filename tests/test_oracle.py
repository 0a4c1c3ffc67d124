"""Driver-contract mirror: every declared query hash-matches its oracle.

Parametrized over the full registry; any query with an oracle is compared
row-for-row (order-insensitive, column-name-sorted) against DuckDB on the
same parquet tables. Queries without an oracle get a rows>=0 smoke check.
"""

from __future__ import annotations

import pytest

from economic_data_project_spark.registry import all_queries

from .conftest import oracle_results

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    # the full sweep runs ONCE, thread-parallel, on first access
    # (conftest.oracle_results); each test just asserts its row
    ok, msg = oracle_results(spark)[name]
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
