"""Session-lifetime cache registry (ADVICE r7/r8 unpersist discipline).

Several builders cache frames that MUST outlive the builder call — the
returned DataFrames read them lazily, so the builder cannot unpersist
them itself (dedup shingle/band/verified-pair caches, the trigram
instance frame). CacheManager dedups by analyzed plan, so the entries
are bounded at one per (builder, sf_dir) and LRU-evicted under
MEMORY_AND_DISK pressure — but a long-lived session sweeping many
sf_dirs accumulates them, and "benign under eviction" is not a
lifetime policy. Every such cache registers here, and a session owner
(a driver between scale factors, the oracle sweep after a corpus, a
notebook user) frees them all with one call:

    from economic_data_project_spark.caches import free_session_caches
    free_session_caches()

The next query on any sf_dir simply rebuilds its caches. This is the
single-JVM analogue of the 100 TB posture, where these frames are
materialized signature TABLES with explicit retention, not executor
caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SESSION_CACHES: list[DataFrame] = []


def register_session_cache(df: DataFrame) -> DataFrame:
    """Track a cached frame whose lifetime exceeds its builder; returns
    the frame so call sites stay one expression (`register_session_cache(
    x.cache())`). Repeat invocations on the same sf_dir re-register the
    same underlying CacheManager entry under a fresh handle — harmless
    (unpersist is idempotent per entry, handles are tiny) and cleared
    on every free."""
    _SESSION_CACHES.append(df)
    return df


def free_session_caches(blocking: bool = False) -> int:
    """Unpersist every registered session-lifetime cache and clear the
    registry; returns the number freed. Safe at any time — consumers
    re-materialize lazily on next use."""
    freed = 0
    while _SESSION_CACHES:
        df = _SESSION_CACHES.pop()
        try:
            df.unpersist(blocking)
            freed += 1
        except Exception:
            # a stopped session or an already-dropped plan must not
            # break the sweep — freeing is an optimization
            pass
    return freed


def free_local_checkpoint(df: DataFrame) -> None:
    """Release a ``localCheckpoint(eager=True)`` frame's storage.

    The checkpointed plan is a bare LogicalRDD whose rdd() IS the
    persisted checkpoint storage; ``DataFrame.unpersist`` is
    CacheManager-based and cannot see it. Guarded: this reaches
    through py4j internals and assumes the analyzed plan's shape — a
    Spark upgrade changing either must degrade to "generation stays
    cached until session end", never fail an iterative loop
    mid-round. Shared by the connected-components and
    pointer-doubling loops."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
