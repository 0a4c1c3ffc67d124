"""Embedding int8 quantization: per-vector symmetric scale quantization
with reconstruction-error audit.

A 100 TB embedding store is 4 bytes/dim float32; serving ANN from it
(similarity/ann.py) is memory-bound, so production vector pipelines
quantize to int8 with a per-vector scale (4x smaller, SIMD-friendly
dot products) and track the reconstruction error they traded away.
This operator is that storage/audit pass: symmetric max-abs scaling
(scale = max|x| / 127), round-half-up quantization, clamp to
[-127, 127], plus the audit columns a pipeline gates on (saturation
count, zero count, mean absolute reconstruction error).

Scale design: strictly map-only — one projection chain of higher-order
array functions per row, zero shuffles except the display ORDER BY,
whole-stage codegen end-to-end. Composes with the ANN bucketing as the
storage format of the corpus side.

Determinism (bit-exact vs the DuckDB oracle): float32 -> double casts
are exact; max over |x| involves no arithmetic; scale = max_abs/127 and
x/scale are single correctly-rounded IEEE divisions; floor(x/scale+0.5)
is exact; q*scale and x - q*scale are single roundings — every
intermediate is the identical double in both engines, and the only
order-dependent reduction (the error sum) folds left-to-right
sequentially in both (Spark ``aggregate`` HOF, DuckDB ``list_reduce``),
so even the unrounded sums agree bit-for-bit. Emissions are rounded
anyway per the repo-wide discipline. Integer audit columns (q_sum,
q_l1, n_zero, n_sat) are exact cross-engine fingerprints of the full
quantized payload without hashing an int array across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_Q_MAX = 127  # symmetric int8 range [-127, 127]; -128 never emitted

_QUANT_ORACLE = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
m AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS max_abs
  FROM v
),
s AS (
  SELECT vec_id, v, max_abs,
         CASE WHEN max_abs > 0 THEN max_abs / {_Q_MAX}.0
              ELSE 1.0 END AS sc
  FROM m
),
q AS (
  SELECT vec_id, v, max_abs, sc,
         list_transform(v, x -> GREATEST(-{_Q_MAX}, LEAST({_Q_MAX},
           CAST(FLOOR(x / sc + 0.5) AS INTEGER)))) AS qv
  FROM s
)
SELECT vec_id,
  CAST(len(v) AS BIGINT) AS n_dims,
  (CASE WHEN max_abs > 0 THEN ROUND(sc, 9) + 0.0 ELSE 0.0 END) AS scale,
  CAST(len(list_filter(qv, e -> e = 0)) AS BIGINT) AS n_zero,
  CAST(len(list_filter(qv, e -> abs(e) = {_Q_MAX})) AS BIGINT) AS n_sat,
  CAST(list_aggregate(list_prepend(0, qv), 'sum') AS BIGINT) AS q_sum,
  CAST(list_aggregate(list_prepend(0,
    list_transform(qv, e -> abs(e))), 'sum') AS BIGINT) AS q_l1,
  (ROUND(list_reduce(list_prepend(0.0::DOUBLE,
     list_transform(list_zip(v, qv),
       p -> abs(p[1] - CAST(p[2] AS DOUBLE) * sc))),
     (acc, x) -> acc + x) / len(v), 9) + 0.0) AS mean_abs_err
FROM q
ORDER BY vec_id
"""


@query("embedding_int8_quant", oracle=_QUANT_ORACLE)
def embedding_int8_quant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # bind each stage as a column so HOF lambdas reference attributes,
    # not recomputed subexpressions (Catalyst never hoists out of
    # lambda bodies — the same discipline as the shingle operators)
    staged = (
        e.select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> cast(x as double))"
            ).alias("v"),
        )
        .select(
            "vec_id",
            "v",
            F.expr(
                "array_max(transform(v, x -> abs(x)))"
            ).alias("max_abs"),
        )
        .select(
            "vec_id",
            "v",
            "max_abs",
            F.when(
                F.col("max_abs") > 0,
                F.col("max_abs") / float(_Q_MAX),
            )
            .otherwise(F.lit(1.0))
            .alias("sc"),
        )
        .select(
            "vec_id",
            "v",
            "max_abs",
            "sc",
            F.expr(
                f"transform(v, x -> greatest(-{_Q_MAX}, least({_Q_MAX},"
                f" cast(floor(x / sc + 0.5d) as int))))"
            ).alias("qv"),
        )
    )
    return staged.select(
        "vec_id",
        F.size("v").cast("long").alias("n_dims"),
        F.when(
            F.col("max_abs") > 0, F.round(F.col("sc"), 9) + F.lit(0.0)
        )
        .otherwise(F.lit(0.0))
        .alias("scale"),
        F.expr("size(filter(qv, e -> e = 0))").cast("long").alias(
            "n_zero"
        ),
        F.expr(f"size(filter(qv, e -> abs(e) = {_Q_MAX}))")
        .cast("long")
        .alias("n_sat"),
        F.expr(
            "aggregate(qv, cast(0 as bigint), (acc, e) -> acc + e)"
        ).alias("q_sum"),
        F.expr(
            "aggregate(qv, cast(0 as bigint), (acc, e) -> acc + abs(e))"
        ).alias("q_l1"),
        (
            F.round(
                F.expr(
                    "aggregate(zip_with(v, qv,"
                    " (x, e) -> abs(x - cast(e as double) * sc)),"
                    " cast(0 as double), (acc, d) -> acc + d)"
                )
                / F.size("v"),
                9,
            )
            + F.lit(0.0)
        ).alias("mean_abs_err"),
    ).orderBy("vec_id")
