"""Advanced operators closing the SURVEY.md §2 tail: range anti-join,
broadcast-lexicon sentiment scoring, semantic-layer metrics.

- Range anti-join (stg_corporate_actions.sql:178-205: NOT EXISTS with a
  +/- day-window predicate): orders with NO event for the same customer
  within +/-5 days. Spark plan: equi part (user key) is a hash join; the
  range predicate rides on it as a join condition, then null-filtering
  gives anti semantics — never a cartesian product.
- Dictionary sentiment (fed_sentiment/lexicon.py:1-50: weighted keyword
  hits, net = (pos-neg)/max(pos+neg,1)): tokens joined against a
  broadcast lexicon — the canonical "tiny dim table" broadcast shape.
- Semantic layer (metrics.yml / semantic_models.yml:1-48): metric name ->
  aggregate expression mapping evaluated per requested dimensions — the
  MetricFlow surface reduced to its Spark-native core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.parity import dsum, sql_davg, sql_dsum
from ..registry import query

# --------------------------------------------------------------------------
# Anti-join with ± range predicate.
# --------------------------------------------------------------------------

_RANGE_ANTI_ORACLE = """
SELECT o_orderkey AS order_key,
       o_custkey AS customer_key,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders o
WHERE o_custkey <= 100
  AND NOT EXISTS (
    SELECT 1 FROM events e
    WHERE e.user_id = o.o_custkey
      AND ABS(datediff('day', CAST(e.ts AS DATE),
                       CAST(o.o_orderdate AS DATE))) <= 5
  )
ORDER BY order_key
"""


@query("orders_without_nearby_event", oracle=_RANGE_ANTI_ORACLE)
def orders_without_nearby_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.to_date("ts").alias("event_date")
    )
    matched = o.join(
        e,
        (o.o_custkey == e.user_id)
        & (
            F.abs(
                F.datediff(F.col("event_date"), F.to_date("o_orderdate"))
            )
            <= 5
        ),
        "left_anti",
    )
    return matched.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("customer_key"),
        F.to_date("o_orderdate").alias("order_date"),
    ).orderBy("order_key")


# --------------------------------------------------------------------------
# Dictionary sentiment scoring over documents.
# --------------------------------------------------------------------------

# Domain lexicon (hawkish/dovish in the reference; bullish/bearish over
# the synthetic engine vocabulary here — same operator, public terms).
LEXICON: dict[str, tuple[str, float]] = {
    "fast": ("pos", 1.0),
    "big": ("pos", 0.5),
    "merge": ("pos", 0.5),
    "slow": ("neg", 1.0),
    "small": ("neg", 0.5),
    "filter": ("neg", 0.5),
}

_LEX_VALUES = ", ".join(
    f"('{t}', '{pol}', {w})" for t, (pol, w) in LEXICON.items()
)

_SENTIMENT_ORACLE = f"""
WITH lex(term, polarity, weight) AS (VALUES {_LEX_VALUES}),
tok AS (
  SELECT doc_id, t.term AS term, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
               AS term FROM documents) t
  GROUP BY doc_id, t.term
),
scored AS (
  SELECT tok.doc_id,
         CAST(SUM(CASE WHEN lex.polarity = 'pos'
                  THEN tok.n * lex.weight ELSE 0 END) AS DOUBLE)
           AS pos_score,
         CAST(SUM(CASE WHEN lex.polarity = 'neg'
                  THEN tok.n * lex.weight ELSE 0 END) AS DOUBLE)
           AS neg_score
  FROM tok JOIN lex ON tok.term = lex.term
  GROUP BY tok.doc_id
)
SELECT doc_id, pos_score, neg_score,
       ((pos_score - neg_score)
        / GREATEST(pos_score + neg_score, 1.0)) AS net_sentiment,
       (CASE WHEN pos_score - neg_score > 0 THEN 'positive'
             WHEN pos_score - neg_score < 0 THEN 'negative'
             ELSE 'neutral' END) AS label
FROM scored
ORDER BY doc_id
"""


@query("sentiment_lexicon_scores", oracle=_SENTIMENT_ORACLE)
def sentiment_lexicon_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        [(t, pol, w) for t, (pol, w) in LEXICON.items()],
        "term string, polarity string, weight double",
    )
    tok = (
        d.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
    )
    scored = (
        tok.join(F.broadcast(lex), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("polarity") == "pos",
                    F.col("n") * F.col("weight"),
                ).otherwise(0.0)
            ).alias("pos_score"),
            F.sum(
                F.when(
                    F.col("polarity") == "neg",
                    F.col("n") * F.col("weight"),
                ).otherwise(0.0)
            ).alias("neg_score"),
        )
    )
    net = (F.col("pos_score") - F.col("neg_score")) / F.greatest(
        F.col("pos_score") + F.col("neg_score"), F.lit(1.0)
    )
    return scored.select(
        "doc_id",
        "pos_score",
        "neg_score",
        net.alias("net_sentiment"),
        F.when(F.col("pos_score") - F.col("neg_score") > 0, "positive")
        .when(F.col("pos_score") - F.col("neg_score") < 0, "negative")
        .otherwise("neutral")
        .alias("label"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Semantic layer: named metrics over declared dimensions.
# --------------------------------------------------------------------------

# metric name -> (Spark aggregate builder, DuckDB aggregate SQL)
METRICS = {
    "total_revenue": (
        lambda: dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ),
        sql_dsum("l_extendedprice * (1 - l_discount)"),
    ),
    "avg_quantity": (
        lambda: (
            dsum("l_quantity") / F.count("l_quantity")
        ),
        sql_davg("l_quantity"),
    ),
    "order_count": (
        lambda: F.countDistinct("l_orderkey"),
        "COUNT(DISTINCT l_orderkey)",
    ),
    "line_count": (lambda: F.count("*"), "COUNT(*)"),
}


def evaluate_metrics(
    fact: DataFrame, dimensions: list[str], metrics: list[str]
) -> DataFrame:
    """The MetricFlow core: resolve metric names to aggregate expressions
    over the requested dimensional grain."""
    unknown = [m for m in metrics if m not in METRICS]
    if unknown:
        raise KeyError(f"unknown metrics {unknown}; known: {list(METRICS)}")
    return fact.groupBy(*dimensions).agg(
        *[METRICS[m][0]().alias(m) for m in metrics]
    )


_METRICS_ORACLE = f"""
SELECT l_returnflag AS flag, l_linestatus AS status,
       {METRICS["total_revenue"][1]} AS total_revenue,
       {METRICS["avg_quantity"][1]} AS avg_quantity,
       {METRICS["order_count"][1]} AS order_count,
       {METRICS["line_count"][1]} AS line_count
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY flag, status
"""


@query("semantic_layer_metrics", oracle=_METRICS_ORACLE)
def semantic_layer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "*",
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
    )
    return evaluate_metrics(
        li,
        ["flag", "status"],
        ["total_revenue", "avg_quantity", "order_count", "line_count"],
    ).orderBy("flag", "status")
