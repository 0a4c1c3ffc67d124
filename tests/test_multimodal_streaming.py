"""Multimodal plumbing + Structured Streaming tests.

Multimodal: deterministic fake decode through a real mapInPandas stage;
frame sampling fan-out; feature extraction downstream.

Streaming: drain the events file-source stream with AvailableNow and
assert the windowed/sessionized results EQUAL the batch plan on the same
input — the strongest equivalence a local test can make.
"""

from __future__ import annotations

import hashlib

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


def run_available_now_update(stream_df, checkpoint, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q
