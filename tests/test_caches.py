"""The session-lifetime cache registry (economic_data_project_spark.
caches): builders register every cache that outlives them; one call
frees them all; consumers rebuild lazily and correctly afterwards."""

from __future__ import annotations

from economic_data_project_spark import caches
from economic_data_project_spark.registry import all_queries

from .conftest import SF_DIR


def test_free_session_caches_unpersists_and_rebuilds(spark):
    qs = all_queries()
    before = qs["dedup_minhash_lsh"](spark, SF_DIR).collect()
    # the builder registered its shingle/band/verified frames
    live = [
        df
        for df in caches._SESSION_CACHES
        if df.storageLevel.useMemory or df.storageLevel.useDisk
    ]
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
