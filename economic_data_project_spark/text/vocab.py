"""Corpus vocabulary statistics: top-term census and bigram PMI
collocations — the precursor passes of tokenizer training and phrase
detection.

Before training a BPE/unigram tokenizer over a corpus you run exactly
these two jobs: a term census (collection frequency + document
frequency for the candidate vocabulary) and an association pass
(PMI-ranked bigrams — the word2vec-style phrase detector that decides
"new york" is one unit). Both are textbook two-level aggregations that
Spark executes as map-side-combined hash aggs.

Scale design:
- ``vocab_top_terms``: explode tokens → one hash agg keyed by term
  (uniform key, map-side partials collapse the per-partition repeats)
  → distributed top-k via TakeOrderedAndProject. cf (collection
  frequency) and df (document frequency) come from the same pre-agg:
  per-(doc, term) counts first, so df is a COUNT and cf a SUM over a
  frame that is already deduped per document — one extra exchange,
  no count-distinct expand over the corpus.
- ``bigram_pmi_collocations``: positional bigrams explode → bigram
  hash agg; unigram totals join in via TWO broadcast-sized maps? No —
  unigram counts are vocabulary-sized, not corpus-sized, but a
  vocabulary can be tens of millions of terms, so both unigram joins
  stay plain shuffled equi-joins on the term key (uniform). PMI uses
  ln(cf_xy * N / (cf_x * cf_y)) over INTEGER counts; ln is not
  guaranteed identically rounded across libm implementations, so the
  emitted score goes through the repo's ROUND(x, 6) + 0.0 discipline.

Determinism: counts are integers; the only float is the final ln,
absorbed by emission rounding; ordering ties break on the bigram text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.ta import sql_emit
from ..registry import query

_TOKENS = "regexp_extract_all(lower(text), '[a-z]+', 0)"
_TOKENS_DUCK = "regexp_extract_all(lower(text), '[a-z]+')"

_TOP_TERMS = 50
_MIN_BIGRAM_COUNT = 5
_TOP_BIGRAMS = 50


# --------------------------------------------------------------------------
# Vocabulary census: top terms by collection frequency, with document
# frequency from the same pre-aggregated frame.
# --------------------------------------------------------------------------

_VOCAB_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, unnest({_TOKENS_DUCK}) AS term FROM documents
),
per_doc_term AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM per_doc GROUP BY doc_id, term
),
census AS (
  SELECT term,
         CAST(SUM(cnt) AS BIGINT) AS cf,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM per_doc_term GROUP BY term
)
SELECT term, cf, df
FROM census
ORDER BY cf DESC, term
LIMIT {_TOP_TERMS}
"""


@query("vocab_top_terms", oracle=_VOCAB_ORACLE)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_doc_term = (
        d.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    census = per_doc_term.groupBy("term").agg(
        F.sum("cnt").alias("cf"),
        F.count("*").cast("long").alias("df"),
    )
    # orderBy(...).limit(k) plans TakeOrderedAndProject: per-partition
    # k-heaps, only k rows per partition reach the driver-side merge
    return census.orderBy(F.desc("cf"), "term").limit(_TOP_TERMS)


# --------------------------------------------------------------------------
# Bigram PMI collocations (phrase-detection pass).
# PMI(x, y) = ln( c(xy) * N_bigrams / (c(x)_left * c(y)_right) ) over
# positional bigram counts; unigram marginals are counted in the SAME
# positional universe (left word of any bigram / right word of any
# bigram) so the probabilities normalize over one sample space.
# --------------------------------------------------------------------------

_BIGRAM_CTE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])))
           AS b
  FROM toks
  WHERE len(toks) >= 2
),
bigrams AS (
  SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM bg WHERE b.w2 IS NOT NULL GROUP BY b.w1, b.w2
),
tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM bigrams),
left_m AS (
  SELECT w1, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM bigrams GROUP BY w1
),
right_m AS (
  SELECT w2, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM bigrams GROUP BY w2
)
"""

_PMI_ORACLE = f"""{_BIGRAM_CTE}
SELECT b.w1, b.w2, b.c_xy,
       {sql_emit(
           "ln(b.c_xy * 1.0 * tot.n / (l.c_x * 1.0 * r.c_y))"
       )} AS pmi
FROM bigrams b
JOIN left_m l USING (w1)
JOIN right_m r USING (w2)
CROSS JOIN tot
WHERE b.c_xy >= {_MIN_BIGRAM_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {_TOP_BIGRAMS}
"""


@query("bigram_pmi_collocations", oracle=_PMI_ORACLE)
def bigram_pmi_collocations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.ta import emit

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.expr(_TOKENS).alias("toks")).where(
        F.size("toks") >= 2
    )
    # positional bigrams from the BOUND token array (lambda references
    # an attribute — same anti-quadratic discipline as the shinglers)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) as w1,"
                " element_at(toks, i + 1) as w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c_xy")
    )
    left_m = bigrams.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    right_m = bigrams.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    tot = F.broadcast(bigrams.agg(F.sum("c_xy").alias("n")))
    scored = (
        bigrams.where(F.col("c_xy") >= _MIN_BIGRAM_COUNT)
        .join(left_m, "w1")
        .join(right_m, "w2")
        .crossJoin(tot)
        .select(
            "w1",
            "w2",
            "c_xy",
            emit(
                F.log(
                    F.col("c_xy")
                    * 1.0
                    * F.col("n")
                    / (F.col("c_x") * 1.0 * F.col("c_y"))
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(
        _TOP_BIGRAMS
    )
