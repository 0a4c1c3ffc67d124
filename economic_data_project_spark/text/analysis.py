"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Mirrors the reference's document/text layer (document_extraction/* —
registry -> text -> chunk -> features) re-targeted at the driver's
``documents`` table, plus the large-scale-corpus operators the reference's
dictionary-sentiment scorer hints at
(macro_agents/.../analysis/fed_sentiment/lexicon.py:1-50).

Everything is built from JVM-side expressions (split / regexp /
higher-order array functions) — zero Python UDFs — so the whole plan stays
inside WholeStageCodegen and scales linearly with the corpus: per-document
work only, no shuffle except the final ORDER BY (display-only; drop it in
a pipeline sink).

Determinism: hashing uses md5 (identical across engines), token rules use
explicit regexes evaluated identically by Java regex and RE2 on the
ASCII-level patterns used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Minimal per-language stopword profiles (public-knowledge function words).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "en"),
    "zh": ("de", "shi", "bu", "le", "zai", "ren", "you", "wo"),
}

_WORD_RE = "[a-z]+"  # BPE-ish alpha tokens, lowercased upstream
_TOKENS = f"regexp_extract_all(lower(text), '{_WORD_RE}', 0)"
_TOKENS_DUCK = f"regexp_extract_all(lower(text), '{_WORD_RE}')"


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
# Token statistics: whitespace tokens, alpha tokens, distinct tokens,
# mean token length, digit/punctuation counts.
# --------------------------------------------------------------------------

_TOKEN_STATS_ORACLE = f"""
SELECT
  doc_id,
  n_chars,
  (len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')))
    AS ws_tokens,
  (len({_TOKENS_DUCK})) AS alpha_tokens,
  (len(list_distinct({_TOKENS_DUCK}))) AS distinct_tokens,
  (CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)) AS digit_chars,
  (CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT)) AS punct_chars
FROM documents
ORDER BY doc_id
"""


@query("text_token_stats", oracle=_TOKEN_STATS_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r15): a spread_scan here measured a REGRESSION in the
    # 9-rep alternating in-process A/B (plain 0.72-0.92x of spread
    # across all four analysis queries — counting/length expressions
    # are too light to beat the exchange + 32-task overhead). Reverted.
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "n_chars",
        F.expr(
            "size(filter(split(text, '\\\\s+'), t -> t != ''))"
        ).cast("long").alias("ws_tokens"),
        F.expr(f"size({_TOKENS})").cast("long").alias("alpha_tokens"),
        F.expr(f"size(array_distinct({_TOKENS}))").cast("long").alias(
            "distinct_tokens"
        ),
        F.expr("size(regexp_extract_all(text, '[0-9]', 0))").cast(
            "long"
        ).alias("digit_chars"),
        F.expr("size(regexp_extract_all(text, '[.,;:!?]', 0))").cast(
            "long"
        ).alias("punct_chars"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Quality scoring: length/stopword/uniqueness heuristics -> 0..1 score ->
# keep/review/drop bucket (the Gopher-rules shape used by corpus filters).
# --------------------------------------------------------------------------

_EN_STOPS = _sql_in_list(LANG_PROFILES["en"])

_QUALITY_ORACLE = f"""
WITH feats AS (
  SELECT
    doc_id,
    n_chars,
    len({_TOKENS_DUCK}) AS n_tok,
    len(list_distinct({_TOKENS_DUCK})) AS n_uniq,
    len(list_filter({_TOKENS_DUCK}, t -> t IN ({_EN_STOPS}))) AS n_stop
  FROM documents
)
SELECT
  doc_id,
  (CASE WHEN n_tok > 0
        THEN CAST(n_uniq AS DOUBLE) / n_tok ELSE 0.0 END) AS ttr,
  (CASE WHEN n_tok > 0
        THEN CAST(n_stop AS DOUBLE) / n_tok ELSE 0.0 END) AS stop_ratio,
  (CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 1 ELSE 0 END) AS len_ok,
  CAST((CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 0.4 ELSE 0.0 END)
   + (CASE WHEN n_tok > 0 AND CAST(n_stop AS DOUBLE) / n_tok > 0.01
           THEN 0.3 ELSE 0.0 END)
   + (CASE WHEN n_tok > 0 AND CAST(n_uniq AS DOUBLE) / n_tok > 0.2
           THEN 0.3 ELSE 0.0 END) AS DOUBLE) AS quality_score,
  (CASE
     WHEN (CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 0.4 ELSE 0.0 END)
        + (CASE WHEN n_tok > 0 AND CAST(n_stop AS DOUBLE) / n_tok > 0.01
                THEN 0.3 ELSE 0.0 END)
        + (CASE WHEN n_tok > 0 AND CAST(n_uniq AS DOUBLE) / n_tok > 0.2
                THEN 0.3 ELSE 0.0 END) >= 0.7 THEN 'keep'
     WHEN (CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 0.4 ELSE 0.0 END)
        + (CASE WHEN n_tok > 0 AND CAST(n_stop AS DOUBLE) / n_tok > 0.01
                THEN 0.3 ELSE 0.0 END)
        + (CASE WHEN n_tok > 0 AND CAST(n_uniq AS DOUBLE) / n_tok > 0.2
                THEN 0.3 ELSE 0.0 END) >= 0.4 THEN 'review'
     ELSE 'drop'
   END) AS quality_bucket
FROM feats
ORDER BY doc_id
"""


def quality_exprs(n_tok, n_uniq, n_stop):
    """The quality-scoring formula as reusable column expressions:
    (ttr, stop_ratio, score, bucket) from token-count columns. Shared by
    `text_quality_scores` and the fused `corpus_filter_verdict`
    (text/screening.py) so the thresholds/weights cannot drift between
    the standalone screen and the composite — a tweak here changes both
    AND both DuckDB oracles must follow (_QUALITY_ORACLE and the
    composed verdict oracle reuse the same SQL text)."""
    ttr = F.when(n_tok > 0, n_uniq.cast("double") / n_tok).otherwise(0.0)
    stop_ratio = F.when(
        n_tok > 0, n_stop.cast("double") / n_tok
    ).otherwise(0.0)
    score = (
        F.when(n_tok.between(20, 100000), 0.4).otherwise(0.0)
        + F.when(stop_ratio > 0.01, 0.3).otherwise(0.0)
        + F.when(ttr > 0.2, 0.3).otherwise(0.0)
    )
    bucket = (
        F.when(score >= 0.7, "keep")
        .when(score >= 0.4, "review")
        .otherwise("drop")
    )
    return ttr, stop_ratio, score, bucket


@query("text_quality_scores", oracle=_QUALITY_ORACLE)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r15): a spread_scan here measured a REGRESSION in the
    # 9-rep alternating in-process A/B (plain 0.72-0.92x of spread
    # across all four analysis queries — counting/length expressions
    # are too light to beat the exchange + 32-task overhead). Reverted.
    d = load_table(spark, sf_dir, "documents")
    stops = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    feats = d.select(
        "doc_id",
        "n_chars",
        F.expr(f"size({_TOKENS})").alias("n_tok"),
        F.expr(f"size(array_distinct({_TOKENS}))").alias("n_uniq"),
        F.expr(f"size(filter({_TOKENS}, t -> t IN ({stops})))").alias(
            "n_stop"
        ),
    )
    n_tok = F.col("n_tok")
    ttr, stop_ratio, score, bucket = quality_exprs(
        n_tok, F.col("n_uniq"), F.col("n_stop")
    )
    return feats.select(
        "doc_id",
        ttr.alias("ttr"),
        stop_ratio.alias("stop_ratio"),
        F.when(n_tok.between(20, 100000), 1).otherwise(0).alias("len_ok"),
        score.alias("quality_score"),
        bucket.alias("quality_bucket"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Language-ID heuristic: per-language stopword-hit scores, argmax with
# deterministic tie-break (score DESC, lang ASC). n-gram-profile shape.
# --------------------------------------------------------------------------


def _lang_scores_duck() -> str:
    return ",\n  ".join(
        f"len(list_filter({_TOKENS_DUCK}, t -> t IN"
        f" ({_sql_in_list(ws)}))) AS score_{lang}"
        for lang, ws in LANG_PROFILES.items()
    )


_LANG_ID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang AS actual_lang,
  {_lang_scores_duck()}
  FROM documents
),
long AS (
  SELECT doc_id, actual_lang, cand, score FROM scored
  UNPIVOT (score FOR cand IN (score_en AS 'en', score_de AS 'de',
                              score_es AS 'es', score_fr AS 'fr',
                              score_zh AS 'zh'))
)
SELECT doc_id, actual_lang,
       (CASE WHEN MAX(score) > 0
             THEN MIN_BY(cand, lpad(CAST(100000 - score AS VARCHAR), 6, '0')
                               || cand)
             ELSE 'und' END)
         AS predicted_lang,
       (MAX(score)) AS best_score
FROM long
GROUP BY doc_id, actual_lang
ORDER BY doc_id
"""


@query("lang_id_heuristic", oracle=_LANG_ID_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r15): a spread_scan here measured a REGRESSION in the
    # 9-rep alternating in-process A/B (plain 0.72-0.92x of spread
    # across all four analysis queries — counting/length expressions
    # are too light to beat the exchange + 32-task overhead). Reverted.
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.expr(
                f"size(filter({_TOKENS}, t -> t IN"
                f" ({_sql_in_list(ws)})))"
            ).alias(f"score_{lang}")
            for lang, ws in LANG_PROFILES.items()
        ],
    )
    long = scored.unpivot(
        ["doc_id", "actual_lang"],
        [f"score_{lang}" for lang in LANG_PROFILES],
        "cand_col",
        "score",
    ).select(
        "doc_id",
        "actual_lang",
        F.substring("cand_col", 7, 2).alias("cand"),
        "score",
    )
    return (
        long.groupBy("doc_id", "actual_lang")
        .agg(
            F.when(
                F.max("score") > 0,
                F.min_by(
                    "cand",
                    F.concat(
                        F.lpad(
                            (F.lit(100000) - F.col("score")).cast("string"),
                            6,
                            "0",
                        ),
                        F.col("cand"),
                    ),
                ),
            )
            .otherwise("und")
            .alias("predicted_lang"),
            F.max("score").alias("best_score"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Document fingerprinting: full-content md5, 3-word-shingle min-hash
# fingerprint (rolling-hash shape, content-addressed like the reference's
# chunk IDs, sec_document_chunks.yml:13-17).
# --------------------------------------------------------------------------

# Built from a BOUND `toks` column: inlining the token regexp into the
# transform lambda would re-run it per shingle index (quadratic in
# document length) — Catalyst does not hoist expressions out of lambda
# bodies, so the caller must project `toks` in a prior select.
_SHINGLES_FROM_TOKS = (
    "transform(sequence(1, greatest(size(toks) - 2, 1)),"
    " i -> concat_ws(' ', slice(toks, i, 3)))"
)
_SHINGLES_DUCK = (
    f"list_transform(range(1, greatest(len({_TOKENS_DUCK}) - 1, 2)),"
    f" i -> array_to_string({_TOKENS_DUCK}[i:i+2], ' '))"
)

_FINGERPRINT_ORACLE = f"""
SELECT
  doc_id,
  md5(text) AS content_hash,
  (list_aggregate(list_transform({_SHINGLES_DUCK}, s -> md5(s)), 'min'))
    AS shingle_fingerprint,
  (len({_SHINGLES_DUCK})) AS n_shingles
FROM documents
ORDER BY doc_id
"""


@query("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r15): a spread_scan here measured a REGRESSION in the
    # 9-rep alternating in-process A/B (plain 0.72-0.92x of spread
    # across all four analysis queries — counting/length expressions
    # are too light to beat the exchange + 32-task overhead). Reverted.
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("content_hash"),
            F.expr(_TOKENS).alias("toks"),
        )
        .select(
            "doc_id",
            "content_hash",
            F.expr(_SHINGLES_FROM_TOKS).alias("sh_arr"),
        )
        .select(
            "doc_id",
            "content_hash",
            F.expr(
                "array_min(transform(sh_arr, s -> md5(s)))"
            ).alias("shingle_fingerprint"),
            F.size("sh_arr").cast("long").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )
