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
