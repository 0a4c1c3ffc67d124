"""Content-defined chunking (CDC): hash-boundary chunking that is
robust to insertions.

Fixed-offset chunking (text/documents.py's char chunker) breaks on
shifted content: prepend ten characters and EVERY downstream chunk
hash changes, so chunk-level dedup finds nothing. CDC instead cuts
where the text ITSELF says to — at positions whose K-char window hash
falls below a threshold — so an edit only disturbs chunks up to the
first boundary after it and every later chunk re-aligns (the
rsync/LBFS/storage-dedup trick, applied to corpus near-dup at the
sub-document level; complements dedup_substring_spans, which censuses
fixed k-token windows).

Mechanics: boundary at position i iff the first 2 hex chars of
md5(text[i .. i+K-1]) < '10' (rate 16/256 = 1/16 → expected chunk
length ~16 chars + the window tail); a chunk runs from the previous
boundary (exclusive) through the boundary position (inclusive); the
final chunk runs to end-of-text. Documents shorter than K (including
empty) are one whole-text chunk.

Scale: map-only per document — window hashes, boundary filter, and the
chunk explode are HOF expressions over the bound text column; the only
exchange is the display sort. O(len * K) hashing per document, same
asymptotics as the shingle operators. Determinism: md5 + ASCII substr
are engine-identical; chunk geometry is integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..registry import query

_K_WIN = 8  # rolling-window width in chars
_BOUNDARY_HI = "10"  # first-2-hex threshold: P(cut) = 16/256 = 1/16

_CDC_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
  FROM documents
),
b AS (
  SELECT doc_id, text, n,
         list_filter(range(1, CAST(greatest(n - {_K_WIN} + 2, 2) AS BIGINT)),
           i -> i <= n - {_K_WIN} + 1
             AND substr(md5(substr(text, CAST(i AS INTEGER), {_K_WIN})),
                        1, 2) < '{_BOUNDARY_HI}') AS bnd
  FROM t
),
g AS (
  SELECT doc_id, text,
         list_prepend(CAST(1 AS BIGINT),
                      list_transform(bnd, x -> x + 1)) AS starts,
         list_append(bnd, n) AS ends
  FROM b
),
c AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(starts) + 1),
           i -> struct_pack(ci := i, s := starts[i], e := ends[i])))
           AS ch,
         text
  FROM g
)
SELECT doc_id,
       CAST(ch.ci AS BIGINT) AS chunk_idx,
       CAST(greatest(ch.e - ch.s + 1, 0) AS BIGINT) AS chunk_len,
       md5(substr(text, CAST(ch.s AS INTEGER),
                  CAST(greatest(ch.e - ch.s + 1, 0) AS INTEGER)))
         AS chunk_hash
FROM c
ORDER BY doc_id, chunk_idx
"""


@query("cdc_chunking", oracle=_CDC_ORACLE)
def cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All positional work runs on a BOUND char array (cs = split
    (text, '')), never substring(text, i, k): Spark's UTF8String
    seeks char positions by scanning from the string start, so a
    transform-over-positions substring is O(len^2) per document (the
    longdoc lane measured 16s before the array form — slice/
    array_join are O(k) — brought it back to linear)."""
    # O(len * K) md5 window hashing is the dominant cost and runs
    # entirely before the first exchange — spread the scan so it
    # parallelizes instead of serializing in one scan task (guide §2.5;
    # no-op at scale, see catalog.spread_scan).
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    staged = (
        d.select(
            "doc_id",
            "text",
            F.length("text").cast("long").alias("n"),
        )
        .select(
            "doc_id",
            "n",
            F.expr("split(text, '')").alias("cs"),
        )
        .select(
            "doc_id",
            "n",
            "cs",
            F.expr(
                f"filter(sequence(1, greatest(n - {_K_WIN} + 1, 1)),"
                f" i -> i <= n - {_K_WIN} + 1"
                f" and substring(md5(array_join(slice(cs,"
                f" cast(i as int), {_K_WIN}), '')), 1, 2)"
                f" < '{_BOUNDARY_HI}')"
            ).alias("bnd"),
        )
    )
    geo = staged.select(
        "doc_id",
        "cs",
        F.expr(
            "concat(array(cast(1 as bigint)),"
            " transform(bnd, x -> x + 1))"
        ).alias("starts"),
        F.expr("concat(bnd, array(n))").alias("ends"),
    )
    return (
        geo.select(
            "doc_id",
            "cs",
            F.posexplode(
                F.expr(
                    "zip_with(starts, ends,"
                    " (s, e) -> struct(s as s, e as e))"
                )
            ).alias("pos", "ch"),
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("chunk_idx"),
            F.greatest(
                F.col("ch.e") - F.col("ch.s") + 1, F.lit(0)
            )
            .cast("long")
            .alias("chunk_len"),
            F.md5(
                F.expr(
                    "array_join(slice(cs, cast(ch.s as int),"
                    " cast(greatest(ch.e - ch.s + 1, 0) as int)), '')"
                )
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
