"""NL->SQL consumption surface (SURVEY.md §3.3 entry point C).

Mirrors the reference's NaturalLanguageToSQLModule lifecycle
(macro_agents/.../analysis/ai/nl_to_sql_module.py:8-76):

    question -> LLM generation -> SQLValidator (single read-only SELECT,
    comment-bypass rejection) -> auto LIMIT -> execute

The LLM call is STUBBED (no model API in this environment): plug a
callable ``generator(question, schema_hint) -> sql`` in production. The
validation + limit + execution path — the part that protects the
warehouse — is fully real and tested.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .warehouse import add_safety_limit, validate_read_only


def schema_hint(spark: SparkSession, tables: list[str]) -> str:
    """Compact schema description handed to the generator (the reference
    serializes INFORMATION_SCHEMA the same way)."""
    lines = []
    for t in tables:
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in spark.table(t).schema.fields
        )
        lines.append(f"{t}({cols})")
    return "\n".join(lines)


def nl_to_sql(
    spark: SparkSession,
    question: str,
    tables: list[str],
    generator: Callable[[str, str], str] | None = None,
    row_limit: int = 1000,
) -> DataFrame:
    """Generate, validate, cap, and execute an analytical SQL answer."""
    if generator is None:
        raise NotImplementedError(
            "no LLM generator configured; pass generator=(question, "
            "schema_hint) -> sql (the reference wires DSPy here, "
            "nl_to_sql_module.py:8-76)"
        )
    sql = generator(question, schema_hint(spark, tables))
    validate_read_only(sql)  # single read-only SELECT or raise
    return spark.sql(add_safety_limit(sql, row_limit))
