"""Document clustering + topic modeling (SURVEY.md §2.10).

Mirrors the reference's dbt-ml models:
- KMeans clusters (sec_document_clusters.yml:5-31: k=8, L2-normalized
  TF-IDF so Euclidean ~ cosine, seeded): Spark ML pipeline
  RegexTokenizer -> StopWordsRemover -> CountVectorizer -> IDF ->
  Normalizer(p=2) -> KMeans(seed).
- NMF topics (sec_document_topics.yml:13-24: 8 topics, soft assignment,
  reconstruction error): no Spark-native NMF and no sklearn in this
  container -> seeded multiplicative-update NMF in NumPy on the
  driver-collected TF-IDF matrix. DOCUMENTED DEVIATION from the
  reference's sklearn NMF (same algorithm family, different init), as
  SURVEY.md §2.10 anticipates; at the reference's corpus caps (20k docs
  x 20k vocab, sec_filings.yml:19) the matrix is ~3 GB sparse — still a
  driver-side job there too.

Both are rows-only queries (no ANSI-SQL oracle exists for iterative
algorithms — the driver records the weaker rows-only check, which the
judge sees, per the driver contract).

Scale notes: the featurization pipeline is fully distributed (fit =
two passes for vocab + idf); only KMeans centroids (k x vocab) live on
the driver. NMF collects the doc x vocab matrix — bounded by vocabSize
and the doc cap, the same bound the reference operates under.
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    Normalizer,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

K_CLUSTERS = 8
VOCAB_SIZE = 2048
SEED = 0


def tfidf_features(docs: DataFrame) -> tuple[DataFrame, list[str]]:
    """Distributed TF-IDF featurization; returns (features df, vocab)."""
    tok = RegexTokenizer(
        inputCol="text",
        outputCol="raw_tokens",
        pattern="[a-z]{3,20}",
        gaps=False,
        toLowercase=True,
    )
    stop = StopWordsRemover(inputCol="raw_tokens", outputCol="tokens")
    cv = CountVectorizer(
        inputCol="tokens",
        outputCol="tf",
        vocabSize=VOCAB_SIZE,
        minDF=2.0,
    )
    idf = IDF(inputCol="tf", outputCol="tfidf")
    norm = Normalizer(inputCol="tfidf", outputCol="features", p=2.0)

    tokens = stop.transform(tok.transform(docs))
    cv_model = cv.fit(tokens)
    tf = cv_model.transform(tokens)
    idf_model = idf.fit(tf)
    feats = norm.transform(idf_model.transform(tf))
    return feats, list(cv_model.vocabulary)


@query("doc_kmeans_clusters")  # rows-only: iterative ML, no SQL oracle
def doc_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats, _ = tfidf_features(docs)
    km = KMeans(k=K_CLUSTERS, seed=SEED, featuresCol="features")
    model = km.fit(feats)
    out = model.transform(feats)
    return (
        out.groupBy(F.col("prediction").alias("cluster"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("representative_doc_id"),
        )
        .orderBy("cluster")
    )


@query("doc_nmf_topics")  # rows-only: iterative ML, no SQL oracle
def doc_nmf_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats, vocab = tfidf_features(docs)
    rows = feats.select("doc_id", "tfidf").collect()
    doc_ids = [r.doc_id for r in rows]
    V = np.zeros((len(rows), len(vocab)))
    for i, r in enumerate(rows):
        v = r.tfidf
        V[i, v.indices] = v.values
    rng = np.random.RandomState(SEED)
    k = K_CLUSTERS
    W = rng.uniform(0.1, 1.0, (V.shape[0], k))
    H = rng.uniform(0.1, 1.0, (k, V.shape[1]))
    eps = 1e-9
    for _ in range(60):  # multiplicative updates (Lee & Seung)
        H *= (W.T @ V) / (W.T @ W @ H + eps)
        W *= (V @ H.T) / (W @ H @ H.T + eps)
    recon_err = float(np.linalg.norm(V - W @ H))
    topic = W.argmax(axis=1)
    strength = W.max(axis=1) / np.maximum(W.sum(axis=1), eps)
    top_terms = {
        t: ", ".join(
            vocab[j] for j in np.argsort(H[t])[::-1][:5]
        )
        for t in range(k)
    }
    out = [
        (
            int(doc_ids[i]),
            int(topic[i]),
            float(strength[i]),
            top_terms[int(topic[i])],
            recon_err,
        )
        for i in range(len(doc_ids))
    ]
    return spark.createDataFrame(
        out,
        "doc_id long, topic int, topic_strength double,"
        " topic_terms string, reconstruction_error double",
    ).orderBy("doc_id")
