"""Oracle output-type sweep: kill the HUGEINT/DECIMAL/timestamp class of bug.

The driver hashes typed values, so a DuckDB HUGEINT (bare ``SUM(int)``),
DECIMAL, or TIMESTAMP output column can hash-mismatch a value-identical
Spark BIGINT/DOUBLE/DATE column. Engine-wide rule (VERDICT r1): every
oracle-checked output column must resolve to BIGINT/INT, DOUBLE, DATE,
STRING, BOOLEAN, or arrays/structs thereof — never HUGEINT, never
DECIMAL, never TIMESTAMP — and the Spark side must carry no decimal /
timestamp / timestamp_ntz columns either.

DuckDB types are resolved lazily via ``con.sql(...)`` (no execution);
Spark types via plan analysis only (no job runs).
"""

from __future__ import annotations

import re

import pytest

from economic_data_project_spark.registry import all_oracles, all_queries

from .conftest import SF_DIR, duckdb_connect

QUERIES = all_queries()
ORACLES = all_oracles()

# DuckDB type names that hash differently from their Spark counterpart.
_DUCK_FORBIDDEN = re.compile(
    r"HUGEINT|DECIMAL|TIMESTAMP", re.IGNORECASE
)
# Spark simpleString fragments that diverge from DuckDB's wire types.
_SPARK_FORBIDDEN = re.compile(r"decimal|timestamp", re.IGNORECASE)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types(duck, name):
    rel = duck.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if _DUCK_FORBIDDEN.search(str(t))
    ]
    assert not bad, (
        f"{name}: oracle emits driver-hostile DuckDB types {bad}; "
        "CAST to BIGINT/DOUBLE/DATE/STRING in the oracle SQL"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_spark_output_types(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if _SPARK_FORBIDDEN.search(f.dataType.simpleString())
    ]
    assert not bad, (
        f"{name}: Spark query emits driver-hostile types {bad}; "
        "cast to bigint/double/date/string before returning"
    )


def test_documents_oracle_byte_contract():
    """The multimodal fake-decode oracles equate DuckDB codepoint math
    (length/ord over VARCHAR) with Spark utf-8 BYTE math, and the
    attach/jsonl queries assume non-NULL text/source — valid only while
    documents.text is ASCII and text/source are non-NULL. Pin that
    testdata contract so a regenerated corpus fails HERE with a
    readable message instead of as an opaque driver hash mismatch."""
    import duckdb

    from .conftest import SF_DIR_ORACLE

    con = duckdb.connect()
    for sf in (SF_DIR, SF_DIR_ORACLE):
        n_nonascii, n_null = con.execute(
            f"""
            SELECT
              SUM(CASE WHEN octet_length(encode(text)) <> length(text)
                       THEN 1 ELSE 0 END),
              SUM(CASE WHEN text IS NULL OR source IS NULL
                       THEN 1 ELSE 0 END)
            FROM read_parquet('{sf}/documents.parquet')
            """
        ).fetchone()
        assert n_nonascii == 0, (
            f"{sf}: {n_nonascii} non-ASCII documents — the multimodal "
            "oracles' ord/length byte math no longer matches Spark"
        )
        assert n_null == 0, (
            f"{sf}: {n_null} NULL text/source rows — multimodal/jsonl "
            "oracle assumptions broken"
        )
