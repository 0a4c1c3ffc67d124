"""Clustering/topic-model checks (rows-only queries get real assertions
here since the driver only counts their rows)."""

from __future__ import annotations

from economic_data_project_spark.registry import all_queries

from .conftest import SF_DIR


def _n_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").count()


def test_kmeans_partitions_all_docs(spark):
    out = all_queries()["doc_kmeans_clusters"](spark, SF_DIR).collect()
    assert 1 <= len(out) <= 8
    assert sum(r.n_docs for r in out) == _n_docs(spark)
    assert all(r.n_docs > 0 for r in out)


def test_nmf_topics_deterministic_and_complete(spark):
    q = all_queries()["doc_nmf_topics"]
    a = q(spark, SF_DIR).collect()
    assert len(a) == _n_docs(spark)
    assert all(0 <= r.topic < 8 for r in a)
    assert all(0.0 <= r.topic_strength <= 1.0 for r in a)
    assert all(r.reconstruction_error == a[0].reconstruction_error for r in a)
    b = q(spark, SF_DIR).collect()  # seeded -> identical rerun
    assert [(r.doc_id, r.topic) for r in a] == [
        (r.doc_id, r.topic) for r in b
    ]
