"""Declarative schema-test engine — the dbt generic-test runner.

The reference declares ~580 column tests across its schema.yml files
(dbt_project/models/*/schema.yml: 255 not_null, 42 accepted_values,
18 value_in_range, 18 unique_combination, 17 unique, plus the custom
macros macros/test_positive_price.sql, test_value_in_range.sql,
test_unique_combination.sql) and dbt compiles each into its own SELECT.

Spark-first deviation: one declarative spec compiles into ONE aggregate
scan per table for all row-level tests (not_null / accepted_values /
value_in_range / positive) — conditional counters in a single hash-agg —
plus one group-by per uniqueness grain and one anti-join per
relationship. dbt's engine runs N queries with N scans; at 100 TB a
table is scanned once here regardless of how many column tests it
carries. Both renderings (Spark plan and DuckDB oracle) derive from the
same spec dict, mirroring the signal-registry single-source pattern.

Output is the dbt-style result relation: one row per test with
(model, column, test_name, n_violations, status) — ORDER BY model,
column, test_name; all BIGINT/STRING per the oracle type rule.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# test vocabulary -> (spark violation predicate, sql violation predicate).
# A violation predicate marks rows that FAIL the test.

SCHEMA_TESTS: dict[str, dict] = {
    "orders": {
        "not_null": ["o_orderkey", "o_custkey", "o_orderdate"],
        "unique": [["o_orderkey"]],
        "accepted_values": {
            "o_orderstatus": ["O", "F", "P"],
            # deliberately narrower than the data's 5 priorities: the
            # engine must report failures, not only passes.
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
        },
        "positive": ["o_totalprice"],
        "relationships": [("o_custkey", "customer", "c_custkey")],
    },
    "lineitem": {
        "not_null": ["l_orderkey", "l_partkey", "l_shipdate"],
        "unique": [["l_orderkey", "l_linenumber"]],
        "accepted_values": {"l_returnflag": ["A", "N", "R"]},
        "value_in_range": {
            "l_discount": (0.0, 0.1),
            "l_quantity": (1.0, 50.0),
            # deliberately too tight -> nonzero violation count
            "l_tax": (0.0, 0.05),
        },
        "positive": ["l_extendedprice"],
        "relationships": [
            ("l_orderkey", "orders", "o_orderkey"),
            ("l_partkey", "part", "p_partkey"),
        ],
    },
    "customer": {
        "not_null": ["c_custkey", "c_name"],
        "unique": [["c_custkey"]],
        "relationships": [("c_nationkey", "nation", "n_nationkey")],
    },
    "part": {
        "not_null": ["p_partkey", "p_name"],
        "unique": [["p_partkey"]],
        "positive": ["p_retailprice"],
        "value_in_range": {"p_size": (1.0, 50.0)},
    },
}


def _sql_quote(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _row_level_tests(spec: dict):
    """Yield (column, test_name, sql_violation).

    One SQL predicate per test, shared verbatim by the Spark side (via
    ``F.expr``, r16) and the DuckDB oracle renderer: the vocabulary
    (IS NULL / NOT IN / NOT BETWEEN / <= 0 over quoted string and float
    literals) parses identically in both dialects, so one rendering
    serves both engines — the old per-test Column thunks cost ~20 py4j
    round trips each at every construction.
    """
    for c in spec.get("not_null", ()):
        yield c, "not_null", f"{c} IS NULL"
    for c, vals in spec.get("accepted_values", {}).items():
        lst = ", ".join(_sql_quote(v) for v in vals)
        yield (
            c,
            "accepted_values",
            f"{c} IS NOT NULL AND {c} NOT IN ({lst})",
        )
    for c, (lo, hi) in spec.get("value_in_range", {}).items():
        yield (
            c,
            "value_in_range",
            f"{c} IS NOT NULL AND {c} NOT BETWEEN {lo!r} AND {hi!r}",
        )
    for c in spec.get("positive", ()):
        yield c, "positive", f"{c} IS NOT NULL AND {c} <= 0"


def _result_sql(model: str, column: str, test: str, n_sql: str) -> str:
    """named_struct literal for one test-result row (r16: one F.expr
    round trip replaces the four-lit F.struct Column build)."""
    return (
        f"named_struct('model', {_sql_quote(model)},"
        f" 'column', {_sql_quote(column)},"
        f" 'test_name', {_sql_quote(test)},"
        f" 'n_violations', CAST({n_sql} AS BIGINT))"
    )


def run_schema_tests(
    spark: SparkSession, tables: dict[str, DataFrame]
) -> DataFrame:
    """Compile the spec against loaded tables into the results relation.

    r16 (guide §5, VERDICT r15 #3): every expression is built as a SQL
    string in Python and parsed with a single ``F.expr`` round trip —
    the Column-operator form cost ~2100 py4j round trips (~0.9s per
    construction, measured by cProfile). The compiled plan is
    unchanged: one aggregate scan per table for all row-level tests,
    one group-by per uniqueness grain, one anti-join per relationship.
    """
    parts: list[DataFrame] = []
    for model, spec in SCHEMA_TESTS.items():
        df = tables[model]
        rows = list(_row_level_tests(spec))
        if rows:
            agg = df.agg(
                *[
                    F.expr(
                        f"SUM(CASE WHEN {sql} THEN 1 ELSE 0 END)"
                    ).alias(f"v{i}")
                    for i, (_, _, sql) in enumerate(rows)
                ]
            )
            structs = ", ".join(
                _result_sql(model, c, t, f"COALESCE(v{i}, 0)")
                for i, (c, t, _) in enumerate(rows)
            )
            parts.append(
                agg.select(
                    F.expr(f"explode(array({structs}))").alias("r")
                ).select("r.*")
            )
        for keys in spec.get("unique", ()):
            dup = (
                df.groupBy(*keys)
                .agg(F.count("*").alias("n"))
                .where(F.col("n") > 1)
                .agg(F.count("*").alias("v"))
            )
            parts.append(
                dup.select(
                    F.expr(
                        _result_sql(model, ", ".join(keys), "unique", "v")
                    ).alias("r")
                ).select("r.*")
            )
        for fk, parent, pk in spec.get("relationships", ()):
            orphans = (
                df.where(F.expr(f"{fk} IS NOT NULL"))
                .join(
                    tables[parent].select(F.col(pk).alias(fk)).distinct(),
                    on=fk,
                    how="left_anti",
                )
                .agg(F.count("*").alias("v"))
            )
            parts.append(
                orphans.select(
                    F.expr(
                        _result_sql(model, fk, "relationships", "v")
                    ).alias("r")
                ).select("r.*")
            )
    out = reduce(DataFrame.unionByName, parts)
    return out.select(
        "model",
        "column",
        "test_name",
        "n_violations",
        F.expr(
            "CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END"
        ).alias("status"),
    ).orderBy("model", "column", "test_name")


def _oracle() -> str:
    selects: list[str] = []
    for model, spec in SCHEMA_TESTS.items():
        for c, t, sql_pred in _row_level_tests(spec):
            selects.append(
                f"SELECT '{model}' AS model, '{c}' AS \"column\","
                f" '{t}' AS test_name,"
                f" CAST((SELECT COUNT(*) FROM {model} WHERE {sql_pred})"
                f" AS BIGINT) AS n_violations"
            )
        for keys in spec.get("unique", ()):
            kl = ", ".join(keys)
            selects.append(
                f"SELECT '{model}', '{kl}', 'unique',"
                f" CAST((SELECT COUNT(*) FROM (SELECT 1 FROM {model}"
                f" GROUP BY {kl} HAVING COUNT(*) > 1)) AS BIGINT)"
            )
        for fk, parent, pk in spec.get("relationships", ()):
            selects.append(
                f"SELECT '{model}', '{fk}', 'relationships',"
                f" CAST((SELECT COUNT(*) FROM {model} c"
                f" WHERE c.{fk} IS NOT NULL AND NOT EXISTS"
                f" (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))"
                f" AS BIGINT)"
            )
    body = "\nUNION ALL\n".join(selects)
    return (
        f"SELECT model, \"column\", test_name, n_violations,"
        f" CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status"
        f" FROM ({body})"
        f" ORDER BY model, \"column\", test_name"
    )


@query("dq_schema_tests", oracle=_oracle())
def dq_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("orders", "lineitem", "customer", "part", "nation")
    }
    return run_schema_tests(spark, tables)
