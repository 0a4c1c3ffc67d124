"""File-based sources: binary document ingestion and CSV seed tables.

- ``read_binary_documents`` mirrors the reference's GCS document source
  (document_extraction/sources/sec_filings.yml:1-22: glob over
  HTML/JSON/PDF objects, incremental by object generation): Spark's
  ``binaryFile`` format yields (path, modificationTime, length, content)
  — content stays an opaque binary column for the multimodal/document
  pipeline; `path` carries the object identity the reference's registry
  keys on. Incremental behavior = path/modificationTime high-watermark
  (Warehouse.incremental_upsert), standing in for Auto Loader.
- ``read_seed`` mirrors dbt seeds (dbt_project/seeds/
  fred_series_mapping.csv): small CSV lookup tables loaded with explicit
  header+schema inference bounds and intended for broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_documents(
    spark: SparkSession, glob_path: str, pattern: str | None = None
) -> DataFrame:
    """Opaque-binary document scan with object identity + size metadata."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.load(glob_path)
    return df.select(
        F.col("path").alias("object_path"),
        F.element_at(F.split("path", "/"), -1).alias("object_name"),
        F.col("modificationTime").alias("modified_at"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
        F.md5("content").alias("content_hash"),
    )


def read_seed(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """CSV seed loader; pass an explicit DDL schema in production —
    inference is allowed only for the tiny lookup-table case."""
    reader = spark.read.option("header", True)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl_documents(
    spark: SparkSession,
    glob_path: str,
    schema: str = DOCUMENTS_JSONL_SCHEMA,
) -> DataFrame:
    """JSON-lines corpus reader — the interchange format most raw
    pre-training corpora actually arrive in (one JSON object per line,
    usually .jsonl/.jsonl.gz shards).

    Contract choices for 100 TB:
    - ALWAYS an explicit schema: schema inference re-reads every shard
      once before the real scan — a full extra pass over the corpus.
    - PERMISSIVE mode with a quarantine column instead of failing the
      job on one malformed line: `_corrupt_record` holds the raw text
      of bad lines; callers split on `_corrupt_record IS NULL` and route
      the quarantine rows to a dead-letter sink. (Columns of a corrupt
      line are NULL, matching the reference warehouse's drifted-type
      tolerance.)
    - gzip/zstd shards decompress transparently via the codec from the
      file extension; each compressed shard is one task (not splittable)
      — shard corpora to ~100-500 MB files upstream, never one big .gz.
    """
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(glob_path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) halves of a PERMISSIVE jsonl read. The clean
    half drops the quarantine column so downstream schemas stay exact;
    the quarantined half keeps identity + raw line for the dead-letter
    sink.

    The parsed frame is CACHED first — required for correctness, not
    just speed: corrupt-record detection depends on which columns the
    scan parses, so an uncached quarantine query (which prunes to few
    columns) disagrees with the clean side about *partially* corrupt
    rows (e.g. one ill-typed field) — Spark refuses such queries
    outright since 2.3 and documents exactly this cache as the
    supported pattern. The cache holds only until both halves are
    consumed; a 100 TB ingest would instead run the split as ONE pass
    writing two sinks (foreachBatch / partitioned write) over the
    cached batch of each shard group."""
    df = df.cache()
    clean = df.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        df.columns[0],
        F.col("_corrupt_record").alias("raw_line"),
    )
    return clean, bad
