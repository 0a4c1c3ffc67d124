"""The session-lifetime cache registry (economic_data_project_spark.
caches): builders register every cache that outlives them; one call
frees them all; consumers rebuild lazily and correctly afterwards —
including when the free races a concurrent reader (the oracle sweep
shares the session across threads)."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from economic_data_project_spark import caches
from economic_data_project_spark.registry import all_queries

from .conftest import SF_DIR


def _live_handles():
    return [
        df
        for df in caches._SESSION_CACHES.values()
        if df.storageLevel.useMemory or df.storageLevel.useDisk
    ]


def test_free_session_caches_unpersists_and_rebuilds(spark):
    qs = all_queries()
    before = qs["dedup_minhash_lsh"](spark, SF_DIR).collect()
    # the builder registered its shingle/band/verified frames
    live = _live_handles()
    assert live, "dedup builders registered no live caches"
    freed = caches.free_session_caches()
    assert freed >= len(live)
    assert not caches._SESSION_CACHES
    for df in live:
        assert not (
            df.storageLevel.useMemory or df.storageLevel.useDisk
        )
    # consumers re-materialize lazily with identical results, and the
    # rebuild re-registers its caches
    after = qs["dedup_minhash_lsh"](spark, SF_DIR).collect()
    assert after == before
    assert caches._SESSION_CACHES


def test_repeat_builder_calls_do_not_grow_registry(spark):
    """ADVICE r9: handles dedup by semanticHash — re-running the same
    builder on the same sf_dir replaces its handles in place instead of
    accumulating duplicates unboundedly."""
    caches.free_session_caches()
    qs = all_queries()
    qs["dedup_minhash_lsh"](spark, SF_DIR)
    n_once = len(caches._SESSION_CACHES)
    assert n_once > 0
    for _ in range(3):
        qs["dedup_minhash_lsh"](spark, SF_DIR)
    assert len(caches._SESSION_CACHES) == n_once


def test_lazy_builds_suppresses_warm_fill(spark):
    """Under lazy_builds() a builder constructs its plan without
    running jobs: warm() is a no-op, the cache registers but stays
    unfilled, and a later action fills it lazily with correct data."""
    caches.free_session_caches()
    sc = spark.sparkContext._jsc.sc()
    base = {info.id() for info in sc.getRDDStorageInfo()}
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    with caches.lazy_builds():
        handle = caches.warm(
            caches.register_session_cache(df.cache())
        )
        # registered but NOT filled: no job ran
        assert caches._SESSION_CACHES
        level = handle.storageLevel
        assert level.useMemory or level.useDisk  # marked for caching
        new = [
            info
            for info in sc.getRDDStorageInfo()
            if info.id() not in base
        ]
        assert not new, "lazy_builds must not run fill jobs"
    # outside the context the fill happens on first action
    assert handle.count() == 100
    caches.free_session_caches()


def test_free_mid_sweep_race_recomputes_correctly(spark):
    """VERDICT r9 #5: the thread-parallel oracle sweep shares the
    session — a free_session_caches() racing another thread's
    cached-frame query must leave both correct (the loser recomputes
    lazily). Hammer the race: one thread re-runs a cache-registering
    query in a loop while another frees repeatedly."""
    qs = all_queries()
    expected = qs["dedup_minhash_lsh"](spark, SF_DIR).collect()
    errors: list[BaseException] = []
    stop = threading.Event()

    def sweeper():
        try:
            for _ in range(6):
                got = qs["dedup_minhash_lsh"](spark, SF_DIR).collect()
                assert got == expected
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        finally:
            stop.set()

    def freer():
        try:
            while not stop.is_set():
                caches.free_session_caches()
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=sweeper), threading.Thread(target=freer)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors, f"race produced failures: {errors!r}"
    caches.free_session_caches()


def test_checkpoint_registry_frees_final_generation(spark):
    """ADVICE r9: the FINAL localCheckpoint generation of an iterative
    loop escapes into the returned plan and DataFrame.unpersist cannot
    see LogicalRDD storage — register_session_checkpoint routes it
    through free_local_checkpoint so free_session_caches() releases it."""
    caches.free_session_caches()
    sc = spark.sparkContext._jsc.sc()
    base = {info.id() for info in sc.getRDDStorageInfo()}
    ck = caches.register_session_checkpoint(
        spark.range(1000).localCheckpoint(eager=True)
    )
    new = [
        info
        for info in sc.getRDDStorageInfo()
        if info.id() not in base
    ]
    assert new, "eager localCheckpoint left no persisted RDD"
    assert len(caches._SESSION_CHECKPOINTS) == 1
    freed = caches.free_session_caches()
    assert freed >= 1
    assert not caches._SESSION_CHECKPOINTS
    ids_after = {info.id() for info in sc.getRDDStorageInfo()}
    for info in new:
        assert info.id() not in ids_after, (
            "checkpoint storage survived free_session_caches"
        )
    # NOTE: unlike cached frames, a freed localCheckpoint is NOT
    # recomputable (the persisted blocks WERE the lineage truncation) —
    # which is exactly why the free happens only at a session-owner
    # boundary (bench lane, corpus switch) when no consumer reads it
    # again. `ck` is deliberately not read after the free.
    del ck


def test_checkpoints_false_frees_caches_only(spark):
    """free_session_caches(checkpoints=False): a mid-sweep caller that
    may race a live checkpoint consumer frees the RECOMPUTABLE caches
    but leaves destructive checkpoint entries registered for the next
    session-owner-boundary sweep (ADVICE r10: releasing a
    localCheckpoint destroys its only copy)."""
    caches.free_session_caches()
    ck = caches.register_session_checkpoint(
        spark.range(100).localCheckpoint(eager=True)
    )
    cached = caches.register_session_cache(spark.range(50).cache())
    cached.count()
    freed = caches.free_session_caches(checkpoints=False)
    assert freed == 1  # the cache, not the checkpoint
    assert len(caches._SESSION_CHECKPOINTS) == 1
    # the checkpoint is still alive and readable after the partial sweep
    assert ck.count() == 100
    # the owner-boundary sweep then releases it
    assert caches.free_session_caches() >= 1
    assert not caches._SESSION_CHECKPOINTS
