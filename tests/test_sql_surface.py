"""SQL entry-point integration: register the star schema as views and
drive a multi-feature analytical statement through the warehouse's
read-only gate — the NL->SQL / conversational consumption path
(SURVEY.md §3.3) end to end."""

from __future__ import annotations

from economic_data_project_spark.catalog import register_views
from economic_data_project_spark.sources.warehouse import (
    add_safety_limit,
    bind_params,
    validate_read_only,
)

from .conftest import SF_DIR


def test_analytical_sql_through_gate(spark):
    register_views(spark, SF_DIR)
    sql = bind_params(
        """
        WITH daily AS (
          SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
                 SUM(l_extendedprice * (1 - l_discount)) AS rev
          FROM lineitem
          WHERE l_shipdate >= @start
          GROUP BY 1, 2
        )
        SELECT flag, d, rev,
               AVG(rev) OVER (PARTITION BY flag ORDER BY d
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS sma7
        FROM daily
        ORDER BY flag, d
        """,
        {"start": "1995-01-01"},
    )
    validate_read_only(sql)
    out = spark.sql(add_safety_limit(sql, 50))
    rows = out.collect()
    assert len(rows) == 50
    assert set(out.columns) == {"flag", "d", "rev", "sma7"}


def test_events_join_documents_sql(spark):
    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        SELECT d.source, COUNT(*) AS n_docs,
               AVG(d.n_chars) AS avg_chars
        FROM documents d
        GROUP BY d.source
        HAVING COUNT(*) > 1
        ORDER BY n_docs DESC, d.source
        """
    ).collect()
    assert len(out) > 0
    assert all(r.n_docs > 1 for r in out)


def test_nl_to_sql_pipeline_with_stub_generator(spark):
    from economic_data_project_spark.sources.nl_sql import nl_to_sql

    register_views(spark, SF_DIR)

    def fake_llm(question, hint):
        assert "orders(" in hint  # schema hint is delivered
        return "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1"

    out = nl_to_sql(spark, "orders by priority?", ["orders"], fake_llm, 3)
    assert out.count() == 3  # safety limit applied

    def evil_llm(question, hint):
        return "DROP TABLE orders"

    import pytest as _pytest
    from economic_data_project_spark.sources.warehouse import (
        QueryValidationError,
    )

    with _pytest.raises(QueryValidationError):
        nl_to_sql(spark, "drop it", ["orders"], evil_llm)

    with _pytest.raises(NotImplementedError):
        nl_to_sql(spark, "no generator", ["orders"])


def test_select_except(spark):
    import pytest as _pytest

    from economic_data_project_spark.functions.dialect import select_except

    register_views(spark, SF_DIR)
    df = spark.table("orders")
    out = select_except(df, "o_orderpriority", "o_orderstatus")
    assert "o_orderpriority" not in out.columns
    assert "o_orderstatus" not in out.columns
    with _pytest.raises(KeyError):
        select_except(df, "nope")
