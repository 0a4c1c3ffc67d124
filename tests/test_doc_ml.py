"""Clustering/topic-model checks (rows-only queries get real assertions
here since the driver only counts their rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from economic_data_project_spark.registry import all_queries

from .conftest import SF_DIR


def _n_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").count()


def test_kmeans_partitions_all_docs(spark):
    out = all_queries()["doc_kmeans_clusters"](spark, SF_DIR).collect()
    assert 1 <= len(out) <= 8
    assert sum(r.n_docs for r in out) == _n_docs(spark)
    assert all(r.n_docs > 0 for r in out)


def test_kmeans_diagnostics_reference_shape(spark):
    # sec_document_clusters.yml: metrics silhouette/inertia, c-TF-IDF
    # top_terms (8), representative_docs (3), seeded determinism.
    q = all_queries()["doc_kmeans_clusters"]
    a = q(spark, SF_DIR).collect()
    for r in a:
        assert -1.0 <= r.silhouette <= 1.0
        assert r.inertia > 0
        terms = r.top_terms.split(", ")
        assert 1 <= len(terms) <= 8 and all(terms)
        reps = r.representative_doc_ids.split(",")
        assert 1 <= len(reps) <= 3
        assert len(reps) == min(r.n_docs, 3)
    b = q(spark, SF_DIR).collect()  # seed=0 -> identical rerun
    assert [(r.cluster, r.n_docs, r.top_terms) for r in a] == [
        (r.cluster, r.n_docs, r.top_terms) for r in b
    ]


def test_tfidf_has_bigrams_and_caps(spark):
    from economic_data_project_spark.text.ml import (
        MAX_DF,
        VOCAB_SIZE,
        tfidf_features,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats, vocab = tfidf_features(docs)
    assert len(vocab) <= VOCAB_SIZE
    assert any(" " in t for t in vocab), "bigram union missing"
    # max_df=0.85: no surviving term may appear in >85% of documents
    n = docs.count()
    df_counts = (
        feats.selectExpr("explode(array_distinct(tokens)) AS t")
        .groupBy("t")
        .count()
        .where(F.col("t").isin(list(vocab)))
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert df_counts <= int(MAX_DF * n) + 1


def test_nmf_corpus_cap_dispatches_to_lda(spark):
    """Above the reference's max_objects cap the driver-side NMF collect
    would be wrong at scale — the query must dispatch to the distributed
    LDA path (same schema), not raise (old behavior) and not collect.
    Full golden coverage lives in test_kernel_golden.py."""
    from economic_data_project_spark.text import ml

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = ml.NMF_MAX_DOCS
    ml.NMF_MAX_DOCS = docs.count() - 1
    try:
        df = all_queries()["doc_nmf_topics"](spark, SF_DIR)
        assert df.count() == docs.count()
    finally:
        ml.NMF_MAX_DOCS = old


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
