"""Streaming corpus ingestion: continuous JSONL shard arrival with
dead-letter quarantine — the Auto-Loader-shaped ingest a large
pre-training corpus actually runs (shards land in object storage, the
stream discovers new files per micro-batch, malformed lines route to a
dead-letter sink instead of failing the job).

Reference counterpart: the incremental document source (object-glob +
generation high-watermark, document_extraction/sources/
sec_filings.yml:1-22) — here the file-source checkpoint IS the
watermark, so re-running the stream processes only shards that arrived
since the last drain (the streaming twin of ``is_incremental()``).

Scale notes:
- ``maxFilesPerTrigger`` bounds each micro-batch — at corpus scale one
  trigger must never list-and-parse a month of backlog in one job.
- The quarantine split runs INSIDE foreachBatch on the pinned batch
  frame (same PERMISSIVE-corrupt-column discipline as the batch
  reader: detection depends on which columns the scan parses, so the
  split must read one materialized frame).
- foreachBatch + append is at-least-once across restarts; a
  transactional sink (Delta) upgrades it to exactly-once unchanged.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ..sources.files import (
    DOCUMENTS_JSONL_SCHEMA,
    _JSONL_INGEST_ORACLE,
    _N_PLANTED_BAD,
    split_quarantine,
)


def shard_documents(
    spark: SparkSession, sf_dir: str, tag: str
) -> tuple[str, str]:
    """Deterministic /tmp staging area for driver-census streaming
    queries: writes the documents table as 4 gzip JSONL shards under
    ``/tmp/spark_graft_<tag>_<hash(sf_dir)>/shards`` (overwritten per
    run) and returns (base_dir, shards_dir). Shared by the ingest and
    dedup censuses so shard layout/hygiene evolves in one place."""
    docs = load_table(spark, sf_dir, "documents")
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{tag}_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    shards = os.path.join(base, "shards")
    docs.repartition(4).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(shards)
    return base, shards


def await_drain(q, timeout: int = 300) -> None:
    """Await an AvailableNow drain and FAIL LOUDLY on timeout: a
    timed-out drain means the sink is partial and still being appended
    — censusing it would surface as a spurious data mismatch that
    looks like an engine bug. Stops the query before raising so the
    sink stops moving."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(
            f"streaming drain did not complete within {timeout}s;"
            " sink is partial — not censusing it"
        )


def read_jsonl_stream(
    spark: SparkSession,
    glob_path: str,
    schema: str = DOCUMENTS_JSONL_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``sources.files.read_jsonl_documents``: same
    explicit schema + PERMISSIVE corrupt-record contract, as a
    file-source stream."""
    if "_corrupt_record" in schema:
        raise ValueError(
            "schema already declares _corrupt_record; pass the payload"
            " schema only — the quarantine column is appended here"
        )
    reader = (
        spark.readStream.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    return reader.json(glob_path)


def stream_ingest_with_quarantine(
    stream_df: DataFrame,
    clean_dir: str,
    dead_letter_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
):
    """Drain available shards: per micro-batch, split the pinned batch
    into clean/quarantine halves and append each to its parquet sink.
    Returns the started query (AvailableNow; caller awaits)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        clean, bad = split_quarantine(batch_df, id_col=id_col)
        clean.write.mode("append").parquet(clean_dir)
        bad.write.mode("append").parquet(dead_letter_dir)
        batch_df.unpersist()  # split_quarantine pinned it

    return (
        stream_df.writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch(_apply)
        .trigger(availableNow=True)
        .start()
    )


@query("jsonl_stream_ingest", oracle=_JSONL_INGEST_ORACLE)
def jsonl_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming ingest, driver-visible: shard the documents table
    (+ a planted dead-letter shard), AvailableNow-drain it through
    ``stream_ingest_with_quarantine``, and census the two parquet
    sinks. SAME oracle as the batch ``jsonl_corpus_ingest`` — stream
    and batch ingestion must agree exactly, which makes this the first
    driver-oracle-checked execution of the streaming engine (the other
    streaming surfaces are equality-tested against batch in pytest).

    Sink + checkpoint dirs are wiped per invocation (the overwrite-
    written shards get fresh file names each run, so a reused
    checkpoint would re-append every shard and double the census)."""
    base, shards = shard_documents(spark, sf_dir, "jstream")
    clean_dir, dead_dir, ckpt = (
        os.path.join(base, d) for d in ("clean", "dead", "ckpt")
    )
    with open(os.path.join(shards, "planted_bad.jsonl"), "w") as fh:
        for k in range(_N_PLANTED_BAD):
            if k % 2:
                fh.write(f"not json at all ({k})\n")
            else:
                fh.write(f'{{"doc_id": {900001 + k}, "text": "truncated\n')
    for d in (clean_dir, dead_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    drain = stream_ingest_with_quarantine(
        read_jsonl_stream(spark, shards), clean_dir, dead_dir, ckpt
    )
    await_drain(drain)
    summary = (
        spark.read.parquet(clean_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    quarantine = (
        spark.read.parquet(dead_dir)
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.lit("__quarantine__").alias("source"),
            "n_docs",
            F.lit(None).cast("long").alias("total_chars"),
        )
    )
    return summary.unionByName(quarantine).orderBy("source")
