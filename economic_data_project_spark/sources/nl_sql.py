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


# ------------------------------------------------- deterministic generator
#
# A template-based generator standing in for the reference's DSPy module
# (nl_to_sql_module.py:8-76): each supported question shape is a regex
# with capture groups rendered into parameterized SQL. Deterministic by
# construction, so the full question -> SQL -> validate -> limit ->
# execute path is exercised end-to-end in tests without a model API; in
# production an LLM generator drops into the same socket.

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"

_TEMPLATES: list[tuple[str, Callable[..., str]]] = [
    (
        rf"how many rows (?:are )?in (?P<t>{_IDENT})",
        lambda m: f"SELECT COUNT(*) AS n_rows FROM {m['t']}",
    ),
    (
        rf"top (?P<k>\d+) (?P<t>{_IDENT}) by (?P<c>{_IDENT})",
        lambda m: (
            f"SELECT * FROM {m['t']} ORDER BY {m['c']} DESC"
            f" LIMIT {int(m['k'])}"
        ),
    ),
    (
        rf"distinct values of (?P<c>{_IDENT}) in (?P<t>{_IDENT})",
        lambda m: (
            f"SELECT DISTINCT {m['c']} FROM {m['t']} ORDER BY {m['c']}"
        ),
    ),
    (
        rf"average (?P<c>{_IDENT}) by (?P<g>{_IDENT}) in (?P<t>{_IDENT})",
        lambda m: (
            f"SELECT {m['g']}, AVG({m['c']}) AS avg_{m['c']}"
            f" FROM {m['t']} GROUP BY {m['g']} ORDER BY {m['g']}"
        ),
    ),
    (
        rf"total (?P<c>{_IDENT}) by (?P<g>{_IDENT}) in (?P<t>{_IDENT})",
        lambda m: (
            f"SELECT {m['g']}, SUM({m['c']}) AS total_{m['c']}"
            f" FROM {m['t']} GROUP BY {m['g']} ORDER BY {m['g']}"
        ),
    ),
    (
        rf"(?P<t>{_IDENT}) rows where (?P<c>{_IDENT}) (?:is )?over"
        r" (?P<v>[0-9.]+)",
        lambda m: f"SELECT * FROM {m['t']} WHERE {m['c']} > {float(m['v'])}",
    ),
    (
        rf"smallest (?P<k>\d+) (?P<t>{_IDENT}) by (?P<c>{_IDENT})",
        lambda m: (
            f"SELECT * FROM {m['t']} ORDER BY {m['c']} ASC"
            f" LIMIT {int(m['k'])}"
        ),
    ),
    (
        rf"count (?P<t>{_IDENT}) by (?P<g>{_IDENT})",
        lambda m: (
            f"SELECT {m['g']}, COUNT(*) AS n FROM {m['t']}"
            f" GROUP BY {m['g']} ORDER BY {m['g']}"
        ),
    ),
    (
        rf"min and max (?P<c>{_IDENT}) in (?P<t>{_IDENT})",
        lambda m: (
            f"SELECT MIN({m['c']}) AS min_{m['c']},"
            f" MAX({m['c']}) AS max_{m['c']} FROM {m['t']}"
        ),
    ),
    (
        rf"monthly (?P<c>{_IDENT}) totals in (?P<t>{_IDENT})"
        rf" by (?P<d>{_IDENT})",
        lambda m: (
            f"SELECT date_trunc('month', CAST({m['d']} AS DATE)) AS month,"
            f" SUM({m['c']}) AS total_{m['c']} FROM {m['t']}"
            " GROUP BY 1 ORDER BY 1"
        ),
    ),
]


class UnsupportedQuestionError(ValueError):
    pass


def template_generator(question: str, hint: str) -> str:
    """Deterministic question -> SQL. Tables referenced must appear in
    the schema hint; unsupported shapes raise (never guess)."""
    import re

    known = {
        line.split("(", 1)[0].strip()
        for line in hint.splitlines()
        if "(" in line
    }
    q = question.strip().rstrip("?").lower()
    for pattern, render in _TEMPLATES:
        m = re.fullmatch(pattern, q)
        if not m:
            continue
        table = m.groupdict().get("t")
        if table and table not in known:
            raise UnsupportedQuestionError(
                f"table {table!r} not in schema hint ({sorted(known)})"
            )
        return render(m)
    raise UnsupportedQuestionError(
        f"no template matches question {question!r}"
    )


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
