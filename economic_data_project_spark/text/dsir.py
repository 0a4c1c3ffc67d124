"""DSIR: data selection via importance resampling on hashed n-grams.

Implements the DSIR estimator (Xie et al. 2023, NeurIPS —
"Data Selection for Language Models via Importance Resampling"): fit
bag-of-hashed-n-gram unigram distributions over a *target* (in-domain)
corpus and the *raw* pool, then weight every raw document by its
log importance ratio sum_g count(g) * ln(p_target(g) / p_raw(g)).
High-weight documents look like the target domain; selection keeps
them. The hashing (n-grams -> B buckets) is the method's core trick:
the feature space is FIXED-SIZE regardless of vocabulary, so the model
is broadcastable by construction at any corpus scale.

Deterministic adaptation (documented like the other stochastic-paper
adaptations in this repo): the paper resamples with Gumbel noise; the
declared contract selects every document whose per-feature average log
ratio exceeds the corpus mean of that statistic — a noise-free
top-fraction proxy (the raw pool CONTAINS the target, so absolute
weights skew negative and a sign test degenerates: measured 0/500
selected at sf0.01), and the mean rides the repo's decimal-exact
aggregation so the DuckDB oracle is exact. Target domain on
the driver corpus: ``lang = 'en'`` (the paper's target is "looks like
Wikipedia+books"; any declared subset works — the estimator only needs
the two empirical distributions).

Feature space: word unigrams + bigrams over ``[a-z]+`` tokens, hashed
into B = 4096 buckets via the first 32 md5 bits (the same cross-engine
hash family as the simhash tiers, text/dedup.py). Add-one smoothing on
both distributions. Each per-(doc, bucket) term is one ln of an
exactly-identical double ratio, quantized through DECIMAL(28,6) so the
sum is order-free in both engines (the lm_quality.py determinism
contract), and the final average is emitted through ROUND(x,6)+0.0.

Scale design (100 TB):
- One corpus text scan builds the cached (doc, bucket) instance frame;
  the model build and the scoring join BOTH read that cache (same
  shape as char_trigram_quality, plan precedent).
- The model is B-bounded (4096 rows) — broadcast safe BY CONSTRUCTION,
  not by data luck; totals ride a broadcast 1-row agg.
- Scoring is a broadcast join + one hash agg on doc_id: the corpus
  shuffles once, on a uniform key.

Reference counterpart: none (beyond-reference LLM-training-pipeline
operator, first-class per the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caches import register_session_cache
from ..catalog import load_table
from ..functions.parity import DEC
from ..functions.ta import emit, sql_emit
from ..registry import query

_B = 4096  # hashed feature buckets (the paper's B=10k regime)

_TOKENS = "regexp_extract_all(lower(text), '[a-z]+', 0)"
_TOKENS_DUCK = "regexp_extract_all(lower(text), '[a-z]+')"

# unigrams ++ bigrams over a bound ``toks`` array. Bigrams via shifted
# slices + zip_with (the lm_quality trigram precedent): O(n), no
# per-position substring scans.
_GRAMS = (
    "concat(toks, zip_with("
    " slice(toks, 1, greatest(size(toks) - 1, 0)),"
    " slice(toks, 2, greatest(size(toks) - 1, 0)),"
    " (x, y) -> concat(x, ' ', y)))"
)
_GRAMS_DUCK = (
    "toks || list_transform("
    " list_filter(range(1, greatest(len(toks), 1)),"
    "  i -> i <= len(toks) - 1),"
    " i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)])"
)

# first 32 md5 bits -> bucket id; both engines read the identical
# 8-hex-char prefix so bucket assignment is bit-identical.
_BUCKET = f"pmod(cast(conv(substr(md5(g), 1, 8), 16, 10) as bigint), {_B})"
_BUCKET_DUCK = f"('0x' || substr(md5(g), 1, 8))::UBIGINT::BIGINT % {_B}"

# per-(doc, bucket) importance term: count * ln(p_t / p_r) with
# add-one smoothing, algebraically folded into ONE ln of one exact
# double ratio (single cross-engine ln call per bucket hit). Every
# operand is EXPLICITLY double: a bare `1.0` literal parses as
# DECIMAL(2,1) in both engines but their decimal promotion/scale
# rules differ, which made the whole term evaluate in mismatched
# decimal arithmetic (measured: systematic ~1e-6 drift, not ln ulp).
_TERM = (
    f"ln(((CAST(c_t AS DOUBLE) + 1) * (n_r + {_B}))"
    f" / ((CAST(c_r AS DOUBLE) + 1) * (n_t + {_B})))"
)

_DSIR_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, (lang = 'en') AS tgt, {_TOKENS_DUCK} AS toks
  FROM documents
),
inst AS (
  SELECT doc_id, tgt, {_BUCKET_DUCK} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT doc_id, tgt, unnest({_GRAMS_DUCK}) AS g FROM toked
  )
  GROUP BY doc_id, tgt, bucket
),
model AS (
  SELECT bucket,
         CAST(SUM(cnt) AS BIGINT) AS c_r,
         CAST(SUM(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS c_t
  FROM inst GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r,
         CAST(SUM(c_t) AS BIGINT) AS n_t
  FROM model
),
scored AS (
  SELECT i.doc_id,
         CAST(SUM(i.cnt) AS BIGINT) AS n_feats,
         (CAST(SUM(CAST(i.cnt * {_TERM} AS DECIMAL(28,6))) AS DOUBLE)
          / SUM(i.cnt)) AS lw
  FROM inst i JOIN model m USING (bucket) CROSS JOIN tot
  GROUP BY i.doc_id
),
stats AS (
  SELECT CAST(SUM(CAST(lw AS DECIMAL(28,6))) AS DOUBLE) / COUNT(lw)
         AS mean_lw
  FROM scored
)
SELECT d.doc_id,
       COALESCE(s.n_feats, 0) AS n_feats,
       {sql_emit("s.lw")} AS dsir_logweight,
       ({sql_emit("s.lw")} > {sql_emit("stats.mean_lw")}) AS selected
FROM documents d
LEFT JOIN scored s ON s.doc_id = d.doc_id
CROSS JOIN stats
ORDER BY d.doc_id
"""


@query("dsir_importance_weights", oracle=_DSIR_ORACLE)
def dsir_importance_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document DSIR importance log-weight against the ``lang='en'``
    target distribution, with the noise-free selection flag."""
    d = load_table(spark, sf_dir, "documents")
    inst = (
        d.select(
            "doc_id",
            (F.col("lang") == "en").alias("tgt"),
            F.expr(_TOKENS).alias("toks"),
        )
        .select("doc_id", "tgt", F.explode(F.expr(_GRAMS)).alias("g"))
        .select("doc_id", "tgt", F.expr(_BUCKET).alias("bucket"))
        .groupBy("doc_id", "tgt", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        # cached: the hashed-feature frame is the only corpus text scan
        # and feeds BOTH the model build and the scoring join (the
        # char_trigram_quality cache precedent; corpus-sized — at
        # 100 TB a materialized intermediate table written once).
        .cache()
        .transform(register_session_cache)
    )
    model = inst.groupBy("bucket").agg(
        F.sum("cnt").alias("c_r"),
        F.sum(
            F.when(F.col("tgt"), F.col("cnt")).otherwise(F.lit(0))
        ).alias("c_t"),
    )
    tot = F.broadcast(
        model.agg(
            F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
        )
    )
    scored = (
        inst.join(F.broadcast(model), "bucket")
        .crossJoin(tot)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            (
                F.sum(
                    (F.col("cnt") * F.expr(_TERM)).cast(DEC)
                ).cast("double")
                / F.sum("cnt")
            ).alias("lw"),
        )
    )
    stats = F.broadcast(
        scored.agg(
            (
                F.sum(F.col("lw").cast(DEC)).cast("double")
                / F.count("lw")
            ).alias("mean_lw")
        )
    )
    lw_emit = emit(F.col("lw"))
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .crossJoin(stats)
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0).cast("long")).alias(
                "n_feats"
            ),
            lw_emit.alias("dsir_logweight"),
            (lw_emit > emit(F.col("mean_lw"))).alias("selected"),
        )
        .orderBy("doc_id")
    )
