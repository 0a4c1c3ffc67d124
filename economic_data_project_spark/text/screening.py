"""Corpus screening + sequence packing for training-data pipelines.

Four operations every LLM-corpus pipeline runs before training that the
reference's document layer stops short of — PII screening, sequence
packing, eval-set decontamination (``benchmark_contamination``), and
repetition filtering (``text_repetition_scores``):

- **PII screening** (``text_pii_scan``): per-document counts of
  email-, phone-, long-digit- and IPv4-shaped substrings plus a
  composite flag. Pure regexp counting — the removal/redaction policy
  is a downstream filter on these columns. Patterns are ASCII-level and
  evaluate identically under Java regex (Spark) and RE2 (DuckDB), so
  the query is oracle-backed; the synthetic corpus contains no PII (all
  zeros — verified), so the value-level check lives in pytest on a
  fixture corpus with planted PII (tests/test_screening.py).

- **Sequence packing** (``doc_token_packing`` / ``packing_bin_stats``):
  assign documents to fixed-capacity context-window bins by cumulative
  token offset, sharded for parallelism — the distributed formulation
  of greedy sequence packing: a global cumulative sum would serialize
  the corpus, so documents are hash-sharded (doc_id % N_SHARDS) and
  packed within shards, which is exactly how a 1000-executor packing
  job runs (each shard's bins feed one writer). Bin id =
  start_offset div capacity — fixed-boundary packing via INTEGER
  division on both engines (a float detour would lose integer
  precision above 2^53 and could shift boundary rows); per-bin stats
  report fill ratios (the one intentional float: capacity is a power
  of two, so the ratio is IEEE-exact on both engines).

Scale: both are one scan over documents; packing shuffles once on the
shard key (uniform by construction); windows partition per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, spread_scan
from ..registry import query
from .analysis import _QUALITY_ORACLE, LANG_PROFILES, quality_exprs

# ---------------------------------------------------------------- PII scan

# ASCII-conservative patterns, identical semantics in Java regex and RE2.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\d{3}[-.]\d{3}[-.]\d{4}",
    "long_digit_run": r"\d{6,}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}


def _pii_oracle() -> str:
    cols = ",\n  ".join(
        f"(CAST(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT))"
        f" AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    any_hit = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH counts AS (
  SELECT doc_id, {cols}
  FROM documents
)
SELECT doc_id, {", ".join("n_" + n for n in PII_PATTERNS)},
       ({any_hit} > 0) AS pii_flag
FROM counts
ORDER BY doc_id
"""


def pii_scan(docs: DataFrame) -> DataFrame:
    """Reusable screening stage over any frame with (doc_id, text)."""
    counts = docs.select(
        "doc_id",
        *[
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(pat), F.lit(0)
                )
            )
            .cast("long")
            .alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
    )
    total = sum(
        (F.col(f"n_{name}") for name in PII_PATTERNS), F.lit(0)
    )
    return counts.withColumn("pii_flag", total > 0).orderBy("doc_id")


@query("text_pii_scan", oracle=_pii_oracle())
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE (r15): a spread_scan here measured a REGRESSION in the
    # 9-rep alternating in-process A/B (spread 1.26s vs plain 0.74s —
    # this scan's regex battery is too light to beat the exchange +
    # 32-task overhead, unlike the fused verdict battery below, which
    # keeps its spread at 1.82x). Reverted.
    return pii_scan(load_table(spark, sf_dir, "documents"))


# ----------------------------------------------------------- token packing

N_SHARDS = 8
BIN_CAPACITY = 512  # tokens per context window; power of two -> /512.0 exact


def bin_id_expr(start_col: str):
    """Context-window bin for a cumulative start offset: integer `div`,
    matching the oracles' `//` at ANY offset. The float detour
    (floor(start / 512.0)) loses integer precision above 2^53 — e.g.
    floor((2**54 - 1) / 512.0) = 35184372088832 while
    (2**54 - 1) div 512 = 35184372088831, so a boundary row would shift
    bins at offsets a 100 TB corpus actually reaches. No float ever
    decides a row's membership; shared by ``doc_token_packing``,
    ``packing_bin_stats`` and ``corpus_training_manifest`` so the 2^53
    unit test (tests/test_screening.py) guards every packing site."""
    return F.expr(f"{start_col} div {BIN_CAPACITY}").cast("long")

_TOKENS_DUCK = "regexp_extract_all(lower(text), '[a-z]+')"

_PACKING_CTE = f"""
toks AS (
  SELECT doc_id, doc_id % {N_SHARDS} AS shard,
         CAST(len({_TOKENS_DUCK}) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset,
         CAST((SUM(n_tokens) OVER w - n_tokens)
              // {BIN_CAPACITY} AS BIGINT) AS bin_id
  FROM toks
  WINDOW w AS (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
"""

_PACKING_ORACLE = f"""
WITH {_PACKING_CTE}
SELECT doc_id, shard, n_tokens, start_offset, bin_id
FROM packed
ORDER BY doc_id
"""

_BIN_STATS_ORACLE = f"""
WITH {_PACKING_CTE}
SELECT shard, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       (SUM(n_tokens) / {BIN_CAPACITY}.0) AS fill_ratio
FROM packed
GROUP BY shard, bin_id
ORDER BY shard, bin_id
"""


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(
            F.regexp_extract_all(
                F.lower("text"), F.lit("[a-z]+"), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_tokens"),
    )
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .cast("long")
        .alias("start_offset"),
    ).withColumn("bin_id", bin_id_expr("start_offset"))


@query("doc_token_packing", oracle=_PACKING_ORACLE)
def doc_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _packed(spark, sf_dir).orderBy("doc_id")


@query("packing_bin_stats", oracle=_BIN_STATS_ORACLE)
def packing_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _packed(spark, sf_dir)
        .groupBy("shard", "bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            (F.sum("n_tokens") / float(BIN_CAPACITY)).alias(
                "fill_ratio"
            ),
        )
        .orderBy("shard", "bin_id")
    )


# ----------------------------------------------- benchmark contamination

# Canary phrases (3-word shingles) standing in for a benchmark/eval-set
# shingle table: in a real decontamination pass this list is the shingled
# benchmark corpus (thousands of n-grams), broadcast against the training
# corpus — the standard eval-decontamination shape. Mixed hit/miss by
# construction so the oracle comparison exercises both branches.
CANARY_SHINGLES: tuple[str, ...] = (
    "row column sort",
    "stream table hash",
    "part filter scan",
    "window fast query",
    "held out phrase",
    "never in corpus",
)

_SHINGLES_EXPR = (
    "transform(sequence(1, greatest(size(toks) - 2, 1)),"
    " i -> concat_ws(' ', slice(toks, i, 3)))"
)
_SHINGLES_DUCK_RAW = (
    "list_transform(range(1, greatest(len(toks) - 1, 2)),"
    " i -> array_to_string(toks[i:i+2], ' '))"
)


def _contamination_oracle() -> str:
    canaries = ", ".join(f"'{c}'" for c in CANARY_SHINGLES)
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct({_SHINGLES_DUCK_RAW.replace("toks", _TOKENS_DUCK)})
           AS shingles
  FROM documents
),
hits AS (
  SELECT doc_id,
         list_sort(list_intersect(shingles, [{canaries}])) AS matched
  FROM sh
)
SELECT doc_id,
       CAST(len(matched) AS BIGINT) AS n_canary_hits,
       COALESCE(array_to_string(matched, ', '), '') AS matched_canaries,
       (len(matched) > 0) AS contaminated
FROM hits
ORDER BY doc_id
"""


@query("benchmark_contamination", oracle=_contamination_oracle())
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination screen: per-document overlap with a
    broadcast benchmark shingle set. At 100 TB the canary list is a
    shingled benchmark corpus joined via broadcast (it is small) —
    here an array-intersect against a literal array, the same map-only
    shape."""
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    canary_arr = F.array(*[F.lit(c) for c in CANARY_SHINGLES])
    # materialize `toks` before shingling: inlining the token regexp into
    # the transform lambda re-runs it per shingle index (quadratic in
    # document length) because Catalyst never hoists out of lambda bodies
    sh = d.select(
        "doc_id",
        F.expr(
            "regexp_extract_all(lower(text), '[a-z]+', 0)"
        ).alias("toks"),
    ).select(
        "doc_id",
        F.array_distinct(F.expr(_SHINGLES_EXPR)).alias("shingles"),
    )
    hits = sh.select(
        "doc_id",
        F.sort_array(
            F.array_intersect("shingles", canary_arr)
        ).alias("matched"),
    )
    return hits.select(
        "doc_id",
        F.size("matched").cast("long").alias("n_canary_hits"),
        F.array_join("matched", ", ").alias("matched_canaries"),
        (F.size("matched") > 0).alias("contaminated"),
    ).orderBy("doc_id")


# --------------------------------------------------- repetition scoring

# Gopher/C4-style repetition filters: duplicate-shingle fraction and
# most-frequent-token fraction, with a composite drop flag.
DUP_SHINGLE_MAX = 0.5
TOP_TOKEN_MAX = 0.2

_REPETITION_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         CAST(len({_SHINGLES_DUCK_RAW}) AS BIGINT) AS n_shingles,
         CAST(len(list_distinct({_SHINGLES_DUCK_RAW})) AS BIGINT)
           AS n_distinct_shingles
  FROM base
),
tok_counts AS (
  SELECT doc_id, t.tok AS tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) t
  GROUP BY doc_id, t.tok
),
top_tok AS (
  SELECT doc_id,
         CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_ratio
  FROM tok_counts GROUP BY doc_id
)
SELECT s.doc_id, s.n_shingles, s.n_distinct_shingles,
       (CASE WHEN s.n_shingles > 0
             THEN 1.0 - CAST(s.n_distinct_shingles AS DOUBLE)
                        / s.n_shingles
             ELSE 0.0 END) AS dup_shingle_ratio,
       COALESCE(t.top_token_ratio, 0.0) AS top_token_ratio,
       ((CASE WHEN s.n_shingles > 0
              THEN 1.0 - CAST(s.n_distinct_shingles AS DOUBLE)
                         / s.n_shingles
              ELSE 0.0 END) > {DUP_SHINGLE_MAX!r}
        OR COALESCE(t.top_token_ratio, 0.0) > {TOP_TOKEN_MAX!r})
         AS repetition_flag
FROM sh s LEFT JOIN top_tok t ON s.doc_id = t.doc_id
ORDER BY s.doc_id
"""


@query("text_repetition_scores", oracle=_REPETITION_ORACLE)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality filter: duplicate 3-gram fraction (shingles
    WITHOUT the dedup distinct) and most-frequent-token fraction. ONE
    map-only pass with zero shuffles beyond the display sort: the token
    mode is max(count) per document, which equals the longest equal run
    in the SORTED token array (the same ``_TOP_RUN_FOLD`` identity the
    fused verdict uses) — so it evaluates per row instead of an
    explode + two hash-aggs that re-scanned the text column a second
    time (a true 2x IO pass at 100 TB; the oracle keeps the
    explode/groupBy formulation, pinning the identity)."""
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = "regexp_extract_all(lower(text), '[a-z]+', 0)"
    # materialize `toks`, then the shingle array, each once per row: the
    # regexp+transform chain is the expensive part; Catalyst neither CSEs
    # it across expressions in one projection nor hoists it out of the
    # transform lambda (an inlined regexp re-runs per shingle index —
    # quadratic in document length)
    per_doc = (
        d.select("doc_id", F.expr(toks).alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.expr(_SHINGLES_EXPR).alias("sh_arr"),
        )
        .select(
            "doc_id",
            F.size("sh_arr").cast("long").alias("n_shingles"),
            F.size(F.array_distinct("sh_arr"))
            .cast("long")
            .alias("n_distinct_shingles"),
            F.expr(_TOP_RUN_FOLD).cast("long").alias("top_run"),
            F.size("toks").cast("long").alias("n_tok"),
        )
    )
    dup = F.when(
        F.col("n_shingles") > 0,
        1.0
        - F.col("n_distinct_shingles").cast("double")
        / F.col("n_shingles"),
    ).otherwise(0.0)
    # a document with zero [a-z]+ tokens has no mode: ratio 0, same as
    # the oracle's COALESCE over the empty explode
    ttr = F.when(
        F.col("n_tok") > 0,
        F.col("top_run").cast("double") / F.col("n_tok"),
    ).otherwise(0.0)
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_distinct_shingles",
        dup.alias("dup_shingle_ratio"),
        ttr.alias("top_token_ratio"),
        (
            (dup > DUP_SHINGLE_MAX) | (ttr > TOP_TOKEN_MAX)
        ).alias("repetition_flag"),
    ).orderBy("doc_id")


# ------------------------------------------------- composite verdict

def _verdict_oracle() -> str:
    """Compose the four screening oracles as subqueries — value-identical
    to the Spark side's fused single-scan projection."""
    return f"""
SELECT q.doc_id, q.quality_bucket, r.repetition_flag, p.pii_flag,
       c.contaminated,
       (q.quality_bucket = 'keep' AND NOT r.repetition_flag
        AND NOT p.pii_flag AND NOT c.contaminated) AS keep
FROM ({_QUALITY_ORACLE}) q
JOIN ({_REPETITION_ORACLE}) r ON q.doc_id = r.doc_id
JOIN ({_pii_oracle()}) p ON q.doc_id = p.doc_id
JOIN ({_contamination_oracle()}) c ON q.doc_id = c.doc_id
ORDER BY q.doc_id
"""


# Longest run of equal elements in the sorted token array == the max
# per-document token count (what the repetition screen's explode +
# groupBy computes) — but evaluable per row, which is what lets the
# composite verdict run as ONE map-only scan with zero shuffles.
_TOP_RUN_FOLD = (
    "aggregate(array_sort(toks),"
    " struct(cast(null as string) as prev, cast(0 as bigint) as run,"
    "        cast(0 as bigint) as best),"
    " (acc, t) -> struct(t as prev,"
    "   CASE WHEN acc.prev IS NOT NULL AND t = acc.prev"
    "        THEN acc.run + 1 ELSE cast(1 as bigint) END as run,"
    "   greatest(acc.best,"
    "     CASE WHEN acc.prev IS NOT NULL AND t = acc.prev"
    "          THEN acc.run + 1 ELSE cast(1 as bigint) END) as best),"
    " acc -> acc.best)"
)


def verdict_frame(
    spark: SparkSession,
    sf_dir: str,
    with_content_hash: bool = False,
    with_n_tokens: bool = False,
) -> DataFrame:
    """One keep/drop verdict per document from quality, repetition, PII,
    and contamination screens — UNSORTED (the reusable building block;
    `corpus_keep_list` consumes it mid-plan). With
    ``with_content_hash``, an ``md5(text)`` column rides the SAME scan
    (corpus_keep_list's exact-dup key); with ``with_n_tokens``, the
    token count the screens already compute is exposed as ``n_tokens``
    (the training manifest's packing weight). Fusing both here keeps
    the whole keep-list derivation at ONE pass over the text column.

    FUSED single-scan plan: every screen column is computed per row from
    one shared projection chain (lower(text) -> toks -> shingles), so
    the whole verdict is one map-only pass over ``documents`` — no
    joins, no shuffles (the standalone screens each re-scan; composing
    them as DataFrames cost ~5 scans + 5 tokenizations at 100 TB). The
    repetition screen's only non-per-row piece, top-token frequency,
    becomes the longest equal-run in the sorted token array (an
    ``aggregate`` fold), which is exactly max(count) per document.
    Plan-gated in tests/test_plans.py: exactly one parquet scan, and
    no hash-partition exchange beyond the spread_scan repartition
    (ADVICE r15: the r15 spread added one REPARTITION_BY_NUM exchange
    and test_corpus_verdict_single_scan was relaxed accordingly)."""
    # the fused screen battery (tokens + shingles + PII regexes +
    # top-run fold) is the heaviest per-row chain in the repo and runs
    # before any exchange — spread the single-split scan (guide §2.5;
    # no-op at scale). The spread exchange carries the raw text ONCE
    # (584 KB at sf0.1); at 100 TB the guard makes it a no-op, so the
    # one-pass-over-text property the docstring argues is unchanged.
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    stops = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    canaries = ", ".join(f"'{c}'" for c in CANARY_SHINGLES)
    extra = (
        [F.md5("text").alias("content_hash")] if with_content_hash else []
    )
    carry = ["content_hash"] if with_content_hash else []
    base = (
        d.select("doc_id", F.lower("text").alias("lt"), *extra)
        .select(
            "doc_id",
            "lt",
            *carry,
            F.expr("regexp_extract_all(lt, '[a-z]+', 0)").alias("toks"),
        )
        .select(
            "doc_id",
            "lt",
            *carry,
            "toks",
            F.expr(_SHINGLES_EXPR).alias("sh_arr"),
        )
        .select(
            "doc_id",
            "lt",
            *carry,
            "toks",
            "sh_arr",
            F.array_distinct("sh_arr").alias("sh_dist"),
        )
    )
    feats = base.select(
        "doc_id",
        *carry,
        # quality features (text_quality_scores' shape, per row)
        F.expr("size(toks)").alias("n_tok"),
        F.expr("size(array_distinct(toks))").alias("n_uniq"),
        F.expr(f"size(filter(toks, t -> t IN ({stops})))").alias("n_stop"),
        # repetition features
        F.size("sh_arr").cast("long").alias("n_shingles"),
        F.size("sh_dist").cast("long").alias("n_distinct_shingles"),
        F.expr(_TOP_RUN_FOLD).alias("top_run"),
        # PII counts
        *[
            F.size(
                F.regexp_extract_all("lt", F.lit(pat), F.lit(0))
            ).alias(f"n_{name}")
            for name, pat in PII_PATTERNS.items()
        ],
        # contamination
        F.expr(
            f"size(array_intersect(sh_dist, array({canaries})))"
        ).alias("n_canary"),
    )
    n_tok = F.col("n_tok")
    # the scoring formula is SHARED with text_quality_scores — one
    # definition, so the standalone screen and this fused verdict (and
    # their composed oracles) cannot drift.
    _ttr, _stop_ratio, score, quality_bucket = quality_exprs(
        n_tok, F.col("n_uniq"), F.col("n_stop")
    )
    dup = F.when(
        F.col("n_shingles") > 0,
        1.0
        - F.col("n_distinct_shingles").cast("double") / F.col("n_shingles"),
    ).otherwise(0.0)
    top_ratio = F.when(
        n_tok > 0, F.col("top_run").cast("double") / n_tok
    ).otherwise(0.0)
    repetition_flag = (dup > DUP_SHINGLE_MAX) | (top_ratio > TOP_TOKEN_MAX)
    pii_flag = (
        sum((F.col(f"n_{name}") for name in PII_PATTERNS), F.lit(0)) > 0
    )
    contaminated = F.col("n_canary") > 0
    tok_carry = (
        [F.col("n_tok").cast("long").alias("n_tokens")]
        if with_n_tokens
        else []
    )
    return feats.select(
        "doc_id",
        *carry,
        *tok_carry,
        quality_bucket.alias("quality_bucket"),
        repetition_flag.alias("repetition_flag"),
        pii_flag.alias("pii_flag"),
        contaminated.alias("contaminated"),
        (
            (quality_bucket == "keep")
            & ~repetition_flag
            & ~pii_flag
            & ~contaminated
        ).alias("keep"),
    )


@query("corpus_filter_verdict", oracle=_verdict_oracle())
def corpus_filter_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end screening verdict, sorted for display — see
    ``verdict_frame`` for the fused single-scan plan notes."""
    return verdict_frame(spark, sf_dir).orderBy("doc_id")


# ------------------------------------------------- corpus keep-list

def _keep_list_oracle() -> str:
    """Compose the verdict, exact-dup, and near-dup oracles: the full
    preprocessing decision per document."""
    from .dedup import _MINHASH_ORACLE

    return f"""
WITH verdict AS ({_verdict_oracle()}),
nd AS ({_MINHASH_ORACLE}),
exact AS (
  SELECT doc_id,
         (doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)))
           AS exact_duplicate
  FROM documents
)
SELECT v.doc_id,
       v.keep AS screen_keep,
       e.exact_duplicate,
       (nd2.doc_id IS NOT NULL) AS neardup_duplicate,
       (v.keep AND NOT e.exact_duplicate AND nd2.doc_id IS NULL) AS keep
FROM verdict v
JOIN exact e ON v.doc_id = e.doc_id
LEFT JOIN (SELECT DISTINCT doc_b AS doc_id FROM nd) nd2
  ON v.doc_id = nd2.doc_id
ORDER BY v.doc_id
"""


def keep_list_frame(
    spark: SparkSession, sf_dir: str, with_n_tokens: bool = False
) -> DataFrame:
    """The end-to-end training-data preprocessing decision, UNSORTED
    (reusable building block; ``corpus_training_manifest`` consumes it
    mid-plan, optionally with the fused ``n_tokens`` column): a
    document survives iff it passes every screen (fused verdict), is
    the canonical copy of its exact-hash cluster, and is not the
    higher-id member of any verified near-dup pair (greedy keep-lowest,
    the standard corpus-dedup policy).

    Two passes over the text column, each the cheapest shape for its
    job — the fused map-only screen scan (which computes the exact-dup
    md5 — and, when asked, the packing token count — on the SAME pass,
    so screens, exact verdict and manifest weight share one scan; the
    hash+window dedup then runs over that projection) and the LSH
    candidate pipeline (which must re-tokenize anyway, through the
    cached shingle frame). The near-dup side arrives as a
    broadcast-sized distinct drop-list, not the full pair set."""
    from .dedup import minhash_pairs

    tok_cols = ["n_tokens"] if with_n_tokens else []
    v = verdict_frame(
        spark,
        sf_dir,
        with_content_hash=True,
        with_n_tokens=with_n_tokens,
    ).select(
        "doc_id",
        F.col("keep").alias("screen_keep"),
        "content_hash",
        *tok_cols,
    )
    w = Window.partitionBy("content_hash")
    v = v.select(
        "doc_id",
        "screen_keep",
        *tok_cols,
        (F.col("doc_id") != F.min("doc_id").over(w)).alias(
            "exact_duplicate"
        ),
    )
    nd = (
        minhash_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("neardup_duplicate", F.lit(True))
    )
    nd_flag = F.coalesce("neardup_duplicate", F.lit(False))
    return v.join(nd, "doc_id", "left").select(
        "doc_id",
        "screen_keep",
        "exact_duplicate",
        nd_flag.alias("neardup_duplicate"),
        (
            F.col("screen_keep")
            & ~F.col("exact_duplicate")
            & ~nd_flag
        ).alias("keep"),
        *tok_cols,
    )


@query("corpus_keep_list", oracle=_keep_list_oracle())
def corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of ``keep_list_frame``, sorted for display."""
    return keep_list_frame(spark, sf_dir).orderBy("doc_id")
