"""Deterministic stratified sampling for training-data pipelines.

A large-scale corpus pipeline needs reproducible stratified sampling —
per-stratum rates (up-weight low-resource languages, down-weight
over-represented sources) where re-running the job on any cluster
layout selects the SAME rows. Seeded ``sampleBy`` is partition-layout
dependent and has no SQL oracle; the scale-correct idiom is
**hash-gate sampling**: include a row iff the first 4 hex chars of
``md5(key)`` fall below the stratum's threshold, with
``threshold = floor(rate * 16^4)`` rendered as zero-padded hex so the
lexicographic string compare IS the numeric compare. Rates are honored
to 1/65536 resolution; membership is a pure function of the key.

Both queries derive from one STRATA spec:
- ``stratified_sample``: the sampled relation itself (doc metadata +
  stratum + target rate);
- ``stratified_sample_report``: per-stratum totals vs sampled counts
  and the realized rate — the sampling QA table.

Scale: map-only gate over the corpus scan (md5 + substring + string
compare, whole-stage codegen); the report is one hash-agg. No shuffle
for the sample itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# (lang, rate) strata; sources unlisted default to 1.0 via 'other'.
STRATA = [
    ("en", 0.25),
    ("de", 0.75),
    ("fr", 0.75),
    ("other", 1.0),
]


def _hex_threshold(rate: float) -> str:
    return format(min(65536, int(rate * 65536)), "04x")


_STRATUM_SQL = (
    "(CASE WHEN lang IN ("
    + ", ".join(f"'{s}'" for s, _ in STRATA if s != "other")
    + ") THEN lang ELSE 'other' END)"
)

_RATE_CASE_SQL = (
    "(CASE "
    + " ".join(
        f"WHEN {_STRATUM_SQL} = '{s}' THEN CAST({r!r} AS DOUBLE)"
        for s, r in STRATA
    )
    + " END)"
)

_GATE_SQL = (
    "(CASE "
    + " ".join(
        f"WHEN {_STRATUM_SQL} = '{s}'"
        f" THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"
        f" < '{_hex_threshold(r)}'"
        for s, r in STRATA
    )
    + " END)"
)

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source, n_chars,
       {_STRATUM_SQL} AS stratum,
       {_RATE_CASE_SQL} AS target_rate
FROM documents
WHERE {_GATE_SQL}
ORDER BY doc_id
"""


def _stratum_col() -> Column:
    known = [s for s, _ in STRATA if s != "other"]
    return F.when(
        F.col("lang").isin(known), F.col("lang")
    ).otherwise("other")


def _gate_col() -> Column:
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    gate = None
    for s, r in STRATA:
        branch = h < _hex_threshold(r)
        cond = _stratum_col() == s
        gate = (
            F.when(cond, branch)
            if gate is None
            else gate.when(cond, branch)
        )
    return gate


def _rate_col() -> Column:
    rate = None
    for s, r in STRATA:
        cond = _stratum_col() == s
        rate = (
            F.when(cond, F.lit(r))
            if rate is None
            else rate.when(cond, F.lit(r))
        )
    return rate


@query("stratified_sample", oracle=_SAMPLE_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            _stratum_col().alias("stratum"),
            _rate_col().alias("target_rate"),
        )
        .where(_gate_col())
        .orderBy("doc_id")
    )


_REPORT_ORACLE = f"""
SELECT {_STRATUM_SQL} AS stratum,
  {_RATE_CASE_SQL} AS target_rate,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN {_GATE_SQL} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_sampled,
  (SUM(CASE WHEN {_GATE_SQL} THEN 1 ELSE 0 END) * 1.0 / COUNT(*))
    AS realized_rate
FROM documents
GROUP BY 1, 2
ORDER BY stratum
"""


@query("stratified_sample_report", oracle=_REPORT_ORACLE)
def stratified_sample_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.select(
        _stratum_col().alias("stratum"),
        _rate_col().alias("target_rate"),
        F.when(_gate_col(), 1).otherwise(0).alias("in_sample"),
    )
    return (
        gated.groupBy("stratum", "target_rate")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum("in_sample").cast("long").alias("n_sampled"),
            (F.sum("in_sample") * 1.0 / F.count("*")).alias(
                "realized_rate"
            ),
        )
        .orderBy("stratum")
    )
