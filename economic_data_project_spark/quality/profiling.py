"""Column profiling: per-column null/distinct/min/max census of a table
in ONE scan.

The data-profiling pass every warehouse runs before trusting a new
source (the reference's analogue is its source-freshness/coverage
reports and dbt schema tests — this is the statistics side of that
layer). One row per column, long format, so the profile of any table
lands in one uniform schema.

Scale design: a single aggregate over a single scan — Spark plans the
multi-column COUNT(DISTINCT) battery with one Expand (rows x columns)
feeding one partial+final hash-agg pair, which is exactly how a 100 TB
profile should run (uniform hash keys, map-side partials, no
per-column re-scan). Exact distinct counts are the oracle-checkable
contract here; on a real 100 TB table swap COUNT(DISTINCT c) for
approx_count_distinct(c) — same single-Expand shape, bounded sketch
memory — and drop the oracle row (HLL sketches differ across engines).

Determinism: min/max are rendered to strings (binary collation; the
testdata contract pins documents.text to ASCII, see
tests/test_oracle_types.py::test_documents_oracle_byte_contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# profiled columns; min/max are rendered via CAST to string uniformly
_PROFILE_COLS = ["doc_id", "lang", "n_chars", "source", "text"]


def _duck_metrics(c: str) -> str:
    return (
        f"CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
        f"  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_nulls,\n"
        f"  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,\n"
        f"  CAST(MIN({c}) AS VARCHAR) AS min_value,\n"
        f"  CAST(MAX({c}) AS VARCHAR) AS max_value"
    )


_PROFILE_ORACLE = (
    "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name,\n  {_duck_metrics(c)}\nFROM documents"
        for c in _PROFILE_COLS
    )
    + "\nORDER BY column_name"
)


@query("corpus_column_profile", oracle=_PROFILE_ORACLE)
def corpus_column_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = d.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack}) AS "
                "(column_name, n_nulls, n_distinct, min_value, max_value)"
            ),
        )
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        )
        .orderBy("column_name")
    )
