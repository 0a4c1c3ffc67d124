"""Streaming in-ingest NEAR-dup detection: simhash64 band-bucket state.

The exact-dedup stream (streaming/dedup.py) drops byte-identical
re-crawls; near-identical ones — boilerplate drift, tracker params,
ad rotation — sail through it. This operator keeps, per
(band_id, band_val) bucket of the 64-bit simhash's 4x16-bit bands
(text/dedup.py SIMHASH64_FOLD / SIMHASH64_BANDS — the batch
`dedup_simhash64` surface computes bit-identical signatures), the
signatures seen within the ingest horizon, and emits a
(doc_a, doc_b, hamming) pair the moment a new arrival lands within
hamming <= 3 of a stored one. It is the streaming counterpart of
`dedup_incremental_minhash`'s shard-vs-index probe: the corpus index
never rebuilds — it IS the operator state.

Scale design (100 TB ingest):
- State: one (ids, sigs) list pair per OCCUPIED band bucket, keyed by
  (band_id, band_val) in the state store — the same shuffle layout as
  a batch groupBy. Idle buckets evict after the processing-time
  horizon (ProcessingTimeTimeout), so state is bounded by
  horizon x arrival rate, exactly the dropDuplicatesWithinWatermark
  bound the exact-dedup stream carries.
- Work per arrival: its 4 bucket lookups touch ~4 x bucket-occupancy
  stored signatures; a random pair shares a 16-bit band with
  p ~ 2^-16, so comparisons stay ~n x 4 x (horizon_rate / 2^16), not
  n^2. The hamming check is an integer XOR popcount in the Arrow
  batch.
- A colliding pair can surface in up to 4 bands: pairs are emitted
  canonicalized (small id, small-id-first) and deduped downstream —
  band emission order must not matter, and it does not: whichever of
  the pair is processed later finds the earlier in state (or in the
  same Arrow batch), so every <= 3-hamming pair whose members both
  pass through within the horizon is emitted at least once.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..registry import query
from ..text.dedup import _HAMMING_MAX, _TOKENS, SIMHASH64_BANDS, SIMHASH64_FOLD

PAIR_SCHEMA = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("hamming", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(LongType())),
    ]
)

_MASK64 = (1 << 64) - 1


def _probe_bucket(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Compare each arrival in this band bucket against the bucket's
    stored signatures (plus earlier arrivals of the same Arrow batch),
    emit hamming <= _HAMMING_MAX pairs, append the arrival to state.

    Intra-batch processing order is pinned to doc_id for determinism,
    but the emitted pair SET is order-invariant: for any colliding
    pair, whichever member is processed later finds the other already
    visible."""
    if state.hasTimedOut:
        state.remove()
        return
    ids, sigs = state.get if state.exists else ([], [])
    ids, sigs = list(ids), list(sigs)
    out_a: list[int] = []
    out_b: list[int] = []
    out_h: list[int] = []
    for pdf in pdfs:
        ordered = pdf.sort_values("doc_id")
        for did, sig in zip(
            ordered["doc_id"].tolist(), ordered["simhash"].tolist()
        ):
            did, sig = int(did), int(sig)
            for oid, osig in zip(ids, sigs):
                if oid == did:
                    continue  # same doc re-entering its own bucket
                h = ((sig ^ osig) & _MASK64).bit_count()
                if h <= _HAMMING_MAX:
                    a, b = (oid, did) if oid < did else (did, oid)
                    out_a.append(a)
                    out_b.append(b)
                    out_h.append(h)
            ids.append(did)
            sigs.append(sig)
    state.update((ids, sigs))
    # idle-bucket eviction: the horizon restarts on every arrival, so
    # a hot bucket lives as long as it keeps receiving — the bound is
    # on IDLE state, the same contract as the exact-dedup watermark
    state.setTimeoutDuration(int(_HORIZON_MS))
    if out_a:
        yield pd.DataFrame(
            {"doc_a": out_a, "doc_b": out_b, "hamming": out_h}
        )


_HORIZON_MS = 3_600_000  # 1 hour, matching stream_exact_dedup's default


def stream_neardup_simhash(stream_df: DataFrame) -> DataFrame:
    """Near-dup pair stream over a document stream: map-only simhash64
    fold -> band explode -> per-bucket stateful probe. Emitted pairs
    may repeat across bands; census-side `distinct` canonicalizes."""
    sig = (
        stream_df.select(
            "doc_id", F.expr(_TOKENS).alias("toks")
        )
        .where(F.size("toks") > 0)
        .select("doc_id", F.expr(SIMHASH64_FOLD).alias("simhash"))
    )
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(SIMHASH64_BANDS)).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    return banded.groupBy("band_id", "band_val").applyInPandasWithState(
        _probe_bucket,
        PAIR_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------- census
# Driver surface: shard the documents table, PLANT a near-dup re-crawl
# shard (the first N docs re-sent verbatim under fresh doc_ids —
# signature-identical, hamming 0), drain with maxFilesPerTrigger=2 so
# the re-crawls arrive in a LATER micro-batch than (most of) the
# originals — cross-batch bucket state is what's under test — and
# census the emitted pair sink. Because hamming <= 3 over 4 bands
# FORCES a shared band (pigeonhole) and the drain stays inside the
# idle horizon, the distinct pair set equals the BATCH all-pairs
# answer over documents + planted copies, which is exactly what the
# oracle states — a batch==stream equality contract, same shape as
# sessionize_events'.

_N_PLANTED = 10


def _await_data_complete(q, timeout: int = 300) -> None:
    """Drain-then-stop for a ProcessingTimeTimeout stateful stream:
    ``awaitTermination`` is the WRONG wait here — with processing-time
    timeouts pending, the AvailableNow trigger never self-terminates
    (Spark keeps scheduling ~1s empty state-maintenance micro-batches
    so future timeouts can fire; the first census attempt burned its
    full 300s this way). Data-complete IS observable: the file
    source's offsets are fixed up front, so the first COMMITTED batch
    with numInputRows == 0 proves every input row's pairs reached the
    sink (append-mode parquet commits per batch). Same pattern as the
    stateful-totals test drain (tests/test_multimodal_streaming.py).
    Fails loudly on timeout — censusing a partial sink would surface
    as a spurious engine mismatch.

    The stop() typically interrupts an in-flight EMPTY maintenance
    batch mid-write — Spark logs an ERROR 'Aborting job' for it, which
    is benign: the aborted write never enters the sink's
    _spark_metadata commit log, and the census reads the sink through
    that log (committed files only)."""
    import time

    deadline = time.time() + timeout
    while time.time() < deadline and q.isActive:
        lp = q.lastProgress
        if lp and lp["batchId"] >= 1 and lp["numInputRows"] == 0:
            q.stop()
            return
        time.sleep(0.5)
    q.stop()
    raise RuntimeError(
        f"near-dup drain not data-complete within {timeout}s;"
        " sink is partial — not censusing it"
    )


def _neardup_census_oracle() -> str:
    from ..text.dedup import _HAMMING_MAX, simhash64_cte_duck

    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 900000 AS doc_id, text FROM (
    SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {_N_PLANTED}
  )
),
{simhash64_cte_duck("corpus").lstrip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.lo_sig, b.lo_sig))
            + bit_count(xor(a.hi_sig, b.hi_sig)) AS BIGINT) AS hamming
FROM sim64 a JOIN sim64 b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo_sig, b.lo_sig))
      + bit_count(xor(a.hi_sig, b.hi_sig)) <= {_HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


@query("stream_neardup_census", oracle=_neardup_census_oracle())
def stream_neardup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import shutil

    from ..catalog import load_table
    from .ingest import read_jsonl_stream, shard_documents

    docs = load_table(spark, sf_dir, "documents")
    base, shards = shard_documents(spark, sf_dir, "sndup")
    sink, ckpt = (os.path.join(base, d) for d in ("pairs", "ckpt"))
    dup_rows = docs.orderBy("doc_id").limit(_N_PLANTED).collect()
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
        stream_neardup_simhash(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_data_complete(drain)
    spark.catalog.refreshByPath(sink)
    return (
        spark.read.parquet(sink)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
