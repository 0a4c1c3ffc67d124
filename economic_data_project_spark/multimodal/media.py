"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow-batched pandas stages.

A 100 TB training-data pipeline treats images/audio/video as opaque
``binary`` columns with typed metadata, decoded only inside vectorized
UDF stages. The Spark-side plumbing here is real and tested — schema,
partitioning, ``mapInPandas`` batch shape, deterministic outputs; the
actual codec step is STUBBED (this container ships no image/audio libs):
``decode_media`` tries Pillow and falls back to a clearly-marked
deterministic fake so every downstream stage stays exercisable.

Scale notes: payload bytes never pass through a shuffle — decode stages
are map-only (mapInPandas preserves partitioning); only the small
extracted features (dims, per-band features) flow into joins/aggs.
Batches arrive as Arrow RecordBatches sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — tune it down when
payloads are MBs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..registry import query

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("source", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("mean_luma", IntegerType(), True),
        StructField("decoder", StringType(), False),
    ]
)


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Turn the documents table into a media table: utf-8 payload bytes
    standing in for encoded image data (deterministic, content-derived)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        "source",
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a codec: dimensions and mean luminance
    derived from the payload digest + bytes. NOT a real decode — the
    fallback when no image library is importable on the workers."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    arr = np.frombuffer(payload, dtype=np.uint8)
    mean_luma = int(arr.mean()) if arr.size else 0
    return width, height, channels, mean_luma


def _pil_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Real image decode via Pillow (runs on the worker; Pillow must be
    importable there). Raises on undecodable bytes — the caller falls
    back to the fake so a corrupt payload degrades, not fails, the
    stage."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        channels = len(img.getbands())
        luma = int(np.asarray(img.convert("L"), dtype=np.float64).mean())
    return width, height, channels, luma


def default_image_decoder():
    """The real decoder when Pillow is importable, else None (fake path).
    Same polarity as ``text/extraction.pdf_text_with_pages``: the
    library's presence UPGRADES the stage, never breaks it."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return None
    return _pil_decode


def decode_media(media: DataFrame, image_decoder=None) -> DataFrame:
    """Arrow-batched decode stage (mapInPandas; map-only, no shuffle).

    ``image_decoder``: optional ``payload_bytes -> (w, h, channels,
    mean_luma)`` applied to ``image/*`` payloads; defaults to Pillow
    when importable. Resolved on the DRIVER and shipped in the closure,
    so tests can inject a decoder without the workers needing the
    library. Decode failures fall back to the deterministic fake
    (decoder column says which path produced each row)."""
    if image_decoder is None:
        image_decoder = default_image_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                # NULL payload (e.g. NULL source text upstream) decodes
                # as empty rather than crashing the whole stage
                raw = b"" if payload is None else bytes(payload)
                decoded = None
                if image_decoder is not None and mtype.startswith("image/"):
                    try:
                        decoded = (*image_decoder(raw), "real")
                    except Exception:
                        decoded = None
                if decoded is None:
                    decoded = (*_fake_decode(raw), "fake")
                rows.append((media_id, mtype, *decoded))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "width",
                    "height",
                    "channels",
                    "mean_luma",
                    "decoder",
                ],
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 97) -> DataFrame:
    """Video frame sampling stand-in: one 'frame' per N payload bytes,
    exploded to (media_id, frame_no, frame_hash). The plumbing —
    1 row -> N rows via a JVM-side explode over a computed count — is
    the real shape; the hash stands in for a decoded frame tensor."""
    n_frames = F.greatest(
        (F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return (
        media.where(F.col("media_type") == "video/mp4")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
            "payload",
        )
        .select(
            "media_id",
            "frame_no",
            F.md5(
                F.concat(
                    F.col("media_id").cast("string"),
                    F.lit(":"),
                    F.col("frame_no").cast("string"),
                )
            ).alias("frame_hash"),
        )
    )


def extract_features(decoded: DataFrame) -> DataFrame:
    """Feature stage over decoded metadata: aspect ratio, size bucket —
    pure JVM expressions downstream of the pandas boundary."""
    return decoded.select(
        "media_id",
        "media_type",
        (F.col("width") / F.col("height")).alias("aspect_ratio"),
        F.when(F.col("width") * F.col("height") >= 40000, "large")
        .otherwise("small")
        .alias("size_bucket"),
        "mean_luma",
    )


# --------------------------------------------------------------------------
# Driver-contract surface: the full pipeline (attach -> mapInPandas decode
# -> JVM feature stage) as registered queries with DuckDB oracles.
#
# The fake payloads are utf-8 text bytes (ASCII in the testdata), so the
# deterministic fake decode is pure byte math DuckDB can replicate:
# md5(payload) == md5(text) for ASCII, and ord(char) == byte value. The
# oracle therefore checks the REAL Arrow/mapInPandas plumbing end-to-end
# — batch iteration, schema, fallback routing — not a parallel stub.
# Output is identical whether or not Pillow is importable on the workers:
# fake payloads are not decodable images, so the real branch raises and
# every row takes the deterministic fake path (decoder column aside,
# which extract_features drops).
# --------------------------------------------------------------------------

_DECODE_FEATURES_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         text,
         md5(text) AS dg
  FROM documents
),
d AS (
  SELECT media_id, media_type,
         64 + ('0x' || substr(dg, 1, 2))::INT % 192 AS width,
         64 + ('0x' || substr(dg, 3, 2))::INT % 192 AS height,
         CASE WHEN length(text) = 0 THEN 0
              ELSE CAST(FLOOR(
                list_aggregate(list_transform(range(1, length(text) + 1),
                  i -> ord(substr(text, i, 1))), 'sum')
                / CAST(length(text) AS DOUBLE)) AS INT)
         END AS mean_luma
  FROM m
)
SELECT media_id, media_type,
       CAST(width AS DOUBLE) / height AS aspect_ratio,
       CASE WHEN width * height >= 40000 THEN 'large' ELSE 'small' END
         AS size_bucket,
       mean_luma
FROM d
ORDER BY media_id
"""


@query("multimodal_decode_features", oracle=_DECODE_FEATURES_ORACLE)
def multimodal_decode_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """attach -> decode (Arrow-batched mapInPandas) -> feature extract.

    Reference capability: the binary document pipeline
    (document_extraction/sources/sec_filings.yml:1-22 — opaque GCS
    payloads with typed metadata, decoded downstream)."""
    # NOTE (r15): a spread_scan("doc_id") ahead of the decode was tried
    # and measured a REGRESSION in an alternating-order in-process A/B
    # (spread median 2.47s vs plain 1.59s, 6 reps/arm): the per-row
    # decode here is microseconds, so 32 Arrow streams just multiply
    # task/stream overhead — the ANN-family flip side of the
    # documents-text win. At corpus scale file count provides the
    # decode parallelism the spread was meant to add.
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return extract_features(decode_media(media)).orderBy("media_id")


_FRAME_SAMPLE_ORACLE = """
WITH v AS (
  SELECT doc_id AS media_id, length(text) AS n_bytes
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT media_id,
         unnest(range(0, GREATEST(
           CAST(FLOOR(n_bytes / 97.0) AS BIGINT), 1))) AS frame_no
  FROM v
)
SELECT media_id, frame_no,
       md5(CAST(media_id AS VARCHAR) || ':' || CAST(frame_no AS VARCHAR))
         AS frame_hash
FROM f
ORDER BY media_id, frame_no
"""


@query("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1 row -> N frames via a JVM-side explode
    over a computed frame count (the real 100 TB shape — payloads never
    shuffle, only the per-frame keys/hashes fan out)."""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(media).orderBy("media_id", "frame_no")
