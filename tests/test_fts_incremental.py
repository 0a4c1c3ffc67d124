"""Incremental FTS postings maintenance — the reference's index-fill job
(fts.py:63-80: 200 new content rows per run merged into
sec_filing_fts_index). Contract: repeated incremental refreshes over a
growing corpus converge to exactly the full rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_project_spark.sources.warehouse import Warehouse

_TOKENS = "regexp_extract_all(lower(text), '[a-z]{3,20}', 0)"


def _postings(docs):
    tok = (
        docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return tok


def _refresh(wh, docs, batch_filter):
    """Index only the docs in the batch; MERGE into the postings table."""
    batch = docs.where(batch_filter)
    wh.upsert(_postings(batch), "fts_index", ["doc_id", "term"])


def test_incremental_refresh_converges_to_full(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "beta gamma delta"),
            (3, "alpha alpha omega"),
            (4, "omega delta delta delta"),
        ],
        ["doc_id", "text"],
    )
    # two incremental batches
    _refresh(wh, docs, F.col("doc_id") <= 2)
    _refresh(wh, docs, F.col("doc_id") > 2)
    got = {
        (r.doc_id, r.term): r.tf for r in wh.table("fts_index").collect()
    }
    want = {
        (r.doc_id, r.term): r.tf for r in _postings(docs).collect()
    }
    assert got == want

    # re-running a batch (late replay) is idempotent
    _refresh(wh, docs, F.col("doc_id") == 2)
    again = {
        (r.doc_id, r.term): r.tf for r in wh.table("fts_index").collect()
    }
    assert again == want

    # an updated document replaces its postings for matched terms
    docs2 = spark.createDataFrame(
        [(2, "beta beta beta gamma")], ["doc_id", "text"]
    )
    wh.upsert(_postings(docs2), "fts_index", ["doc_id", "term"])
    updated = {
        (r.doc_id, r.term): r.tf for r in wh.table("fts_index").collect()
    }
    assert updated[(2, "beta")] == 3
