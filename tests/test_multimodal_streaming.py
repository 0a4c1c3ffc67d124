"""Multimodal plumbing + Structured Streaming tests.

Multimodal: deterministic fake decode through a real mapInPandas stage;
frame sampling fan-out; feature extraction downstream.

Streaming: drain the events file-source stream with AvailableNow and
assert the windowed/sessionized results EQUAL the batch plan on the same
input — the strongest equivalence a local test can make.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from economic_data_project_spark.catalog import load_table
from economic_data_project_spark.multimodal.media import (
    attach_fake_media,
    decode_media,
    extract_features,
    frame_sample,
)
from economic_data_project_spark.streaming.sessions import (
    read_events_stream,
    run_available_now,
    session_windows,
    windowed_counts,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return attach_fake_media(docs).cache()


def test_media_schema_and_payloads(media):
    row = media.orderBy("media_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.n_bytes == len(row.payload)
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image/png", "audio/wav", "video/mp4"}


def test_decode_media_deterministic(spark, media):
    decoded = decode_media(media)
    rows = {r.media_id: r for r in decoded.collect()}
    assert len(rows) == media.count()
    # independently recompute one row's fake decode
    sample = media.orderBy("media_id").first()
    digest = hashlib.md5(bytes(sample.payload)).digest()
    r = rows[sample.media_id]
    assert r.width == 64 + digest[0] % 192
    assert r.height == 64 + digest[1] % 192
    assert r.channels == 1 + digest[2] % 3
    assert r.decoder == "fake"
    # decode is map-only: no shuffle in the physical plan
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_frame_sample_fanout(media):
    frames = frame_sample(media, every_n_bytes=97)
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    vids = {
        r.media_id: r.n_bytes
        for r in media.where("media_type = 'video/mp4'").collect()
    }
    assert set(counts) == set(vids)
    for mid, nb in vids.items():
        assert counts[mid] == max(nb // 97, 1)


def test_extract_features(media):
    feats = extract_features(decode_media(media))
    row = feats.first()
    assert 0 < row.aspect_ratio < 4.1
    assert row.size_bucket in ("large", "small")


# ------------------------------------------------- real-decoder injection


def _tiny_png(pixels: list[list[int]]) -> bytes:
    """A real (if minimal) 8-bit grayscale PNG, stdlib only."""
    h, w = len(pixels), len(pixels[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _mini_png_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Stdlib PNG decoder (grayscale, filter-0 only) standing in for
    Pillow: proves REAL decoded dims/luma flow through the stage when a
    decoder is present."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a png")
    w, h = struct.unpack(">II", payload[16:24])
    pos, idat = 8, b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w + 1
    vals: list[int] = []
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        if row[0] != 0:
            raise ValueError("unsupported filter")
        vals.extend(row[1:])
    return w, h, 1, int(sum(vals) / len(vals))


def test_decode_media_real_decoder_path(spark):
    """With an image decoder present, image payloads decode for REAL
    (decoder='real', true dims/luma); corrupt payloads and non-image
    types fall back to the fake — the presence of a codec upgrades the
    stage, never breaks it (the old guard raised instead)."""
    png = _tiny_png([[10, 20], [30, 40]])
    rows = [
        (1, "image/png", bytearray(png), "t", len(png)),
        (2, "image/png", bytearray(b"corrupt bytes"), "t", 13),
        (3, "audio/wav", bytearray(b"riff-ish"), "t", 8),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary,"
        " source string, n_bytes long",
    )
    decoded = {
        r.media_id: r
        for r in decode_media(media, image_decoder=_mini_png_decode).collect()
    }
    good = decoded[1]
    assert (good.width, good.height, good.channels) == (2, 2, 1)
    assert good.mean_luma == 25  # (10+20+30+40)/4
    assert good.decoder == "real"
    assert decoded[2].decoder == "fake"
    assert decoded[3].decoder == "fake"
    # real dims flow through the downstream feature stage
    feats = {
        r.media_id: r
        for r in extract_features(
            decode_media(media, image_decoder=_mini_png_decode)
        ).collect()
    }
    assert feats[1].aspect_ratio == 1.0
    assert feats[1].size_bucket == "small"
    assert feats[1].mean_luma == 25


def test_registered_decode_query_decoder_invariant(spark, media):
    """The multimodal_decode_features ORACLE assumes fake text payloads
    never decode as real images: with a working image decoder injected,
    attach -> decode -> features must produce IDENTICAL rows (every
    fake payload raises inside the decoder and falls back), so the
    driver oracle stays valid on any cluster that ships Pillow."""
    small = media.orderBy("media_id").limit(30)
    base = extract_features(decode_media(small)).orderBy(
        "media_id"
    ).collect()
    injected = extract_features(
        decode_media(small, image_decoder=_mini_png_decode)
    ).orderBy("media_id").collect()
    assert base == injected


def test_default_decoder_polarity():
    """default_image_decoder returns the Pillow path iff Pillow imports —
    never raises. In this container (no Pillow) it must be None."""
    from economic_data_project_spark.multimodal.media import (
        default_image_decoder,
    )

    dec = default_image_decoder()
    try:
        import PIL.Image  # noqa: F401

        assert dec is not None
    except ImportError:
        assert dec is None


def test_normalize_ts_utc_guard(spark):
    """NTZ->TIMESTAMP is wall-clock-identical only under UTC: a non-UTC
    session must fail loudly, not silently shift timestamps."""
    from economic_data_project_spark.catalog import normalize_ts

    df = spark.range(1).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="timezone|UTC"):
            normalize_ts(df)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert dict(normalize_ts(df).dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    stream = windowed_counts(read_events_stream(spark, SF_DIR))
    q = run_available_now(stream, str(tmp_path / "ckpt1"), "win_counts")
    try:
        got = {
            (str(r.window_start), r.event_type): (r.n_events, r.total_value)
            for r in spark.table("win_counts").collect()
        }
    finally:
        q.stop()
    events = load_table(spark, SF_DIR, "events")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
    )
    want = {
        (str(r.ws), r.event_type): (r.n, r.tv) for r in batch.collect()
    }
    assert got == want


def test_streaming_session_windows_match_batch(spark, tmp_path):
    stream = session_windows(read_events_stream(spark, SF_DIR))
    q = run_available_now(stream, str(tmp_path / "ckpt2"), "sess")
    try:
        got = {
            (str(r.session_start), r.user_id): r.n_events
            for r in spark.table("sess").collect()
        }
    finally:
        q.stop()
    events = load_table(spark, SF_DIR, "events")
    batch = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("s"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("s.start").alias("ss"), "user_id", "n")
    )
    want = {(str(r.ss), r.user_id): r.n for r in batch.collect()}
    assert got == want


def test_stream_upsert_foreachbatch(spark, tmp_path):
    from economic_data_project_spark.sources.warehouse import Warehouse
    from economic_data_project_spark.streaming.sessions import stream_upsert

    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream = windowed_counts(read_events_stream(spark, SF_DIR))
    q = stream_upsert(
        stream,
        wh,
        "event_rollup",
        ["window_start", "event_type"],
        str(tmp_path / "ckpt3"),
    )
    q.awaitTermination(300)
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in wh.table("event_rollup").collect()
    }
    events = load_table(spark, SF_DIR, "events")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
    )
    want = {(str(r.ws), r.event_type): (r.n, r.tv) for r in batch.collect()}
    assert got == want


def test_streaming_jsonl_ingest_quarantine_and_incremental(
    spark, tmp_path
):
    """The Auto-Loader-shaped corpus ingest: jsonl shards drain through
    micro-batches (maxFilesPerTrigger=1 forces several) into a clean
    parquet sink + a dead-letter sink; then a NEW shard arrives and a
    re-drain on the same checkpoint processes ONLY it — no reprocessing
    duplicates, the streaming twin of is_incremental()."""
    import json

    import pandas as pd

    from economic_data_project_spark.streaming.ingest import (
        read_jsonl_stream,
        stream_ingest_with_quarantine,
    )

    recs = (
        pd.read_parquet(f"{SF_DIR}/documents.parquet")
        .head(60)
        .to_dict("records")
    )
    shards = tmp_path / "shards"
    shards.mkdir()
    for k in range(3):
        lines = [json.dumps(r) for r in recs[k * 20 : (k + 1) * 20]]
        if k == 1:
            lines.append('{"doc_id": 999, BROKEN')
        (shards / f"shard-{k}.jsonl").write_text("\n".join(lines) + "\n")
    clean_dir = str(tmp_path / "clean")
    dead_dir = str(tmp_path / "dead")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = stream_ingest_with_quarantine(
            read_jsonl_stream(
                spark, str(shards), max_files_per_trigger=1
            ),
            clean_dir,
            dead_dir,
            ckpt,
        )
        q.awaitTermination(300)

    drain()
    got = {
        r.doc_id: r.text for r in spark.read.parquet(clean_dir).collect()
    }
    assert got == {int(r["doc_id"]): r["text"] for r in recs}
    bad = spark.read.parquet(dead_dir).collect()
    assert len(bad) == 1 and "BROKEN" in bad[0].raw_line

    # a late shard arrives; same checkpoint -> only the new file runs
    (shards / "shard-3.jsonl").write_text(
        json.dumps(
            {"doc_id": 7777, "text": "late shard", "lang": "en",
             "source": "late", "n_chars": 10}
        )
        + "\n"
    )
    drain()
    clean2 = spark.read.parquet(clean_dir)
    assert clean2.count() == len(recs) + 1  # no duplicates from re-drain
    assert clean2.where("doc_id = 7777").count() == 1
    assert spark.read.parquet(dead_dir).count() == 1


def test_salted_join_equals_plain_join(spark):
    from economic_data_project_spark.functions.dialect import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i in range(200) for k in (["hot"] * 3 + ["cold"])],
        ["k", "v"],
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], ["k", "name"]
    )
    salted = salted_join(fact, dim, "k").orderBy("k", "v").collect()
    plain = fact.join(dim, "k").orderBy("k", "v").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    left = salted_join(fact, dim.where("k = 'hot'"), "k", "left")
    assert left.where("name IS NULL").count() == 200  # cold keys kept


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState running per-user totals drained with
    AvailableNow equal the batch aggregation over the same input."""
    from economic_data_project_spark.streaming.stateful import (
        running_user_totals,
    )

    stream = read_events_stream(spark, SF_DIR)
    q = run_available_now_update(
        running_user_totals(stream),
        str(tmp_path / "ck_stateful"),
        "stateful_totals",
    )
    q.stop()
    got = {
        r.user_id: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) AS rn
                 FROM stateful_totals) WHERE rn = 1"""
        ).collect()
    }
    batch = load_table(spark, SF_DIR, "events")
    expected = {
        r.user_id: r
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, exp in expected.items():
        assert got[uid].n_events == exp.n_events
        assert got[uid].total_value == pytest.approx(
            exp.total_value, abs=1e-6
        )
        assert got[uid].max_value == exp.max_value
        assert got[uid].finalized == "open"


def test_stateful_timeout_branch_finalizes():
    """The hasTimedOut branch emits the final totals and removes state.
    Driven directly with a fake GroupState: the streaming drain above
    stops at data-complete and never waits out the 60s processing-time
    timeout, so this branch needs its own deterministic exercise."""
    from economic_data_project_spark.streaming.stateful import _update

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.removed = False
            self.hasTimedOut = True
            self.exists = True

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

    st = FakeState((7, 12.5, 9.0, "click"))
    rows = list(_update((41,), iter([]), st))
    assert st.removed
    assert len(rows) == 1
    out = rows[0].iloc[0]
    assert (
        out["user_id"],
        out["n_events"],
        out["total_value"],
        out["max_value"],
        out["last_event_type"],
        out["finalized"],
    ) == (41, 7, 12.5, 9.0, "click", "timeout")


def run_available_now_update(stream_df, checkpoint, name):
    """Drain an UPDATE-mode stateful stream and return once the data is
    fully in the sink.

    ``awaitTermination`` is the wrong wait here: with
    ProcessingTimeTimeout state, the AvailableNow trigger never
    self-terminates — Spark keeps scheduling empty "no new data but
    cleaning up state" micro-batches (~1s each, forever) so future
    timeouts can fire, and the old awaitTermination(300) burned its
    full 300s on every run. Data-complete IS observable: the file
    source's offsets are fixed up front, so the first COMMITTED batch
    with numInputRows == 0 proves every input row's update has reached
    the sink. Poll for that and hand the still-active query back for
    the caller to stop."""
    import time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 300
    while time.time() < deadline and q.isActive:
        lp = q.lastProgress
        if lp and lp["batchId"] >= 1 and lp["numInputRows"] == 0:
            break
        time.sleep(0.5)
    return q


def test_stream_neardup_census_equals_batch_simhash64(spark):
    """Batch==stream equality for the in-ingest near-dup operator:
    among ORIGINAL doc ids (the planted 900000+ re-crawls filtered
    out), the streaming census' pair set must equal the batch
    dedup_simhash64 answer over the same corpus — the streaming
    band-bucket state is just the batch band join unrolled over
    arrival order. The planted re-crawls themselves must each match
    their original at hamming 0 (cross-micro-batch state: the
    re-crawl shard arrives in a later batch than most originals), and
    a second invocation must reproduce the census exactly (checkpoint
    and sink hygiene)."""
    from economic_data_project_spark.registry import all_queries
    from economic_data_project_spark.streaming.neardup import _N_PLANTED

    qs = all_queries()
    census = qs["stream_neardup_census"](spark, SF_DIR).collect()
    got_all = {(r.doc_a, r.doc_b, r.hamming) for r in census}

    batch = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in qs["dedup_simhash64"](spark, SF_DIR).collect()
    }
    stream_originals = {
        t for t in got_all if t[0] < 900000 and t[1] < 900000
    }
    assert stream_originals == batch

    # every planted re-crawl with a tokenizable original matched it
    docs = load_table(spark, SF_DIR, "documents")
    planted_ids = [
        r.doc_id
        for r in docs.orderBy("doc_id").limit(_N_PLANTED).collect()
    ]
    for i in planted_ids:
        assert (i, 900000 + i, 0) in got_all

    rerun = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in qs["stream_neardup_census"](spark, SF_DIR).collect()
    }
    assert rerun == got_all


def test_neardup_bucket_timeout_branch_evicts_state():
    """The idle-bucket eviction branch removes state and emits nothing.
    Driven directly with a fake GroupState: the census drain stops at
    data-complete, so this branch (like the stateful-totals one) needs
    its own deterministic exercise. Also pins the in-batch semantics:
    a batch arriving into existing state emits pairs against BOTH the
    stored signatures and earlier rows of the same batch, exactly
    once each, canonicalized small-id-first."""
    import pandas as pd

    from economic_data_project_spark.streaming.neardup import (
        _probe_bucket,
    )

    class FakeState:
        def __init__(self, value, timed_out=False):
            self._v = value
            self.exists = value is not None
            self.hasTimedOut = timed_out
            self.removed = False
            self.updated = None

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    st = FakeState(([1], [0]), timed_out=True)
    assert list(_probe_bucket((0, 7), iter([]), st)) == []
    assert st.removed

    # stored sig 0 for doc 1; batch brings doc 5 (sig 0, hamming 0 vs
    # doc 1) and doc 9 (sig 1, hamming 1 vs both) -> three pairs
    st2 = FakeState(([1], [0]))
    batch = pd.DataFrame({"doc_id": [9, 5], "simhash": [1, 0]})
    out = list(_probe_bucket((0, 7), iter([batch]), st2))
    pairs = sorted(
        map(tuple, out[0][["doc_a", "doc_b", "hamming"]].values.tolist())
    )
    assert pairs == [(1, 5, 0), (1, 9, 1), (5, 9, 1)]
    assert st2.updated == ([1, 5, 9], [0, 0, 1])
    assert st2.timeout_ms > 0
