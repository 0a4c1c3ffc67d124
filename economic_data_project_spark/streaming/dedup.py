"""Streaming exact dedup: content-hash dropDuplicates over the corpus
ingest stream, with watermark-bounded state.

A continuously-ingesting corpus (streaming/ingest.py) re-receives the
same document endlessly — mirror sites, re-crawls, retried uploads —
so dedup must run IN the ingest path, not as a nightly batch over the
accumulated mess. This is Structured Streaming's
``dropDuplicatesWithinWatermark``: state is one entry per content hash
seen within the watermark horizon, evicted after it, so state size is
bounded by the dedup horizon x arrival rate instead of growing with
corpus lifetime (the plain ``dropDuplicates`` alternative keeps every
hash forever — correct but unbounded; at 100 TB you choose the horizon
that matches your re-crawl cadence).

Event time is the shard's file modification time (the file source's
``_metadata`` column) — arrival time, which is exactly the right clock
for "the same bytes arrived again within N hours".

Driver surface: ``stream_dedup_census`` shards the documents table
PLUS a planted duplicate shard (first 10 docs re-sent under new
doc_ids), drains with maxFilesPerTrigger=2 so the duplicates arrive in
a LATER micro-batch than their originals (proving dedup state persists
across batches, not just within one), and censuses the survivor sink:
every content hash must appear exactly once — the same census the
batch oracle states as SELECT DISTINCT md5(text).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .ingest import await_drain, read_jsonl_stream, shard_documents

_N_PLANTED_DUPS = 10


def stream_exact_dedup(
    stream_df: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Watermarked content-hash dedup over a document stream. Emits the
    first arrival of each hash within the horizon; later copies are
    dropped. State: one (hash, ts) entry per distinct hash in the
    horizon, evicted by the watermark."""
    hashed = stream_df.withColumn(
        "content_hash", F.md5("text")
    ).withColumn(
        "arrival_ts", F.col("_metadata.file_modification_time")
    )
    # the full document payload rides THROUGH the dedup — survivors go
    # straight to the ingest sink; dropping to (id, hash) here would
    # force a re-join against the un-deduped source downstream
    return hashed.withWatermark(
        "arrival_ts", horizon
    ).dropDuplicatesWithinWatermark(["content_hash"])


_DEDUP_CENSUS_ORACLE = """
SELECT content_hash, CAST(1 AS BIGINT) AS n_kept
FROM (SELECT DISTINCT md5(text) AS content_hash FROM documents)
ORDER BY content_hash
"""


@query("stream_dedup_census", oracle=_DEDUP_CENSUS_ORACLE)
def stream_dedup_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base, shards = shard_documents(spark, sf_dir, "sdedup")
    sink, ckpt = (os.path.join(base, d) for d in ("kept", "ckpt"))
    # planted duplicate shard: the first N docs' exact texts re-sent
    # under fresh doc_ids (a re-crawl). Written as a SEPARATE shard so
    # maxFilesPerTrigger=2 puts it in a later micro-batch than (most
    # of) the originals — cross-batch dedup state is what's under test.
    dup_rows = (
        docs.orderBy("doc_id").limit(_N_PLANTED_DUPS).collect()
    )
    with open(os.path.join(shards, "zz_recrawl.jsonl"), "w") as fh:
        for r in dup_rows:
            fh.write(
                json.dumps(
                    {
                        "doc_id": 900000 + r.doc_id,
                        "text": r.text,
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": r.n_chars,
                    }
                )
                + "\n"
            )
    for d in (sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    stream = read_jsonl_stream(
        spark, shards, max_files_per_trigger=2
    ).where(F.col("_corrupt_record").isNull())
    drain = (
        stream_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(drain)
    spark.catalog.refreshByPath(sink)
    return (
        spark.read.parquet(sink)
        .groupBy("content_hash")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("content_hash")
    )
