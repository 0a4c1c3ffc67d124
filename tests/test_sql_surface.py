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


def test_nl_to_sql_template_battery(spark):
    """All 10 canned question shapes run the FULL path: template
    generation -> read-only validation -> safety limit -> execution
    (ref nl_to_sql_module.py:8-76)."""
    from economic_data_project_spark.catalog import load_table
    from economic_data_project_spark.sources.nl_sql import (
        UnsupportedQuestionError,
        nl_to_sql,
        template_generator,
    )
    from .conftest import SF_DIR

    for t in ("orders", "nation"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)

    battery = {
        "how many rows in orders?": lambda df: df.collect()[0].n_rows > 0,
        "top 5 orders by o_totalprice": lambda df: df.count() == 5,
        "distinct values of o_orderstatus in orders":
            lambda df: 1 <= df.count() <= 3,
        "average o_totalprice by o_orderstatus in orders":
            lambda df: "avg_o_totalprice" in df.columns,
        "total o_totalprice by o_orderpriority in orders":
            lambda df: df.count() == 5,
        "orders rows where o_totalprice over 400000":
            lambda df: all(r.o_totalprice > 400000 for r in df.collect()),
        "smallest 3 orders by o_totalprice": lambda df: df.count() == 3,
        "count orders by o_orderstatus": lambda df: df.count() <= 3,
        "min and max o_totalprice in orders":
            lambda df: df.collect()[0].min_o_totalprice
            <= df.collect()[0].max_o_totalprice,
        "monthly o_totalprice totals in orders by o_orderdate":
            lambda df: df.count() > 12,
    }
    for question, check in battery.items():
        out = nl_to_sql(
            spark, question, ["orders", "nation"], template_generator, 5000
        )
        assert check(out), question

    # unknown table and unsupported shape both refuse, never guess
    import pytest as _pytest

    with _pytest.raises(UnsupportedQuestionError):
        nl_to_sql(
            spark, "how many rows in secrets", ["orders"],
            template_generator,
        )
    with _pytest.raises(UnsupportedQuestionError):
        nl_to_sql(
            spark, "please summarize the vibes", ["orders"],
            template_generator,
        )
