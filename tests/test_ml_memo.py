"""Unit tests for the fitted-surface memo in text/ml.py (ADVICE r13).

Two hazards the r13 review named, each reproduced here without a
SparkSession (the memo only reads ``spark.sparkContext.applicationId``):

1. A directory-backed parquet table whose part file is rewritten IN
   PLACE (content changed, no file added/removed) changes neither the
   table-dir nor the parent-dir mtime — the old two-stat XOR served a
   stale fitted model. The fingerprint is now per-part
   (relpath, size, mtime_ns).
2. The memo grew without bound across scratch corpora (hundreds of
   pytest tmp_path dirs in one long-lived session). It is now a small
   LRU (``_ML_MEMO_CAP``).
"""

from __future__ import annotations

import os

import pytest

from economic_data_project_spark.text import ml


class _FakeCtx:
    applicationId = "test-app"


class _FakeSpark:
    sparkContext = _FakeCtx()


@pytest.fixture(autouse=True)
def _clean_memo():
    ml._ML_MEMO.clear()
    yield
    ml._ML_MEMO.clear()


def _make_corpus(root, name="sf", part_bytes=b"v1-payload"):
    sf_dir = root / name
    table = sf_dir / "documents.parquet"
    table.mkdir(parents=True)
    part = table / "part-00000.parquet"
    part.write_bytes(part_bytes)
    return sf_dir, part


def test_memo_hits_on_unchanged_corpus(tmp_path):
    sf_dir, _ = _make_corpus(tmp_path)
    calls = []
    build = lambda: calls.append(1) or "fitted"
    assert ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", build) == "fitted"
    assert ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", build) == "fitted"
    assert len(calls) == 1


def test_in_place_part_rewrite_invalidates(tmp_path):
    """The ADVICE scenario: same file name, same byte count, no dir
    mtime change — only the part file's own mtime moves."""
    sf_dir, part = _make_corpus(tmp_path, part_bytes=b"AAAA")
    table = part.parent
    dir_times = (os.stat(table).st_atime_ns, os.stat(table).st_mtime_ns)
    parent_times = (os.stat(sf_dir).st_atime_ns, os.stat(sf_dir).st_mtime_ns)

    calls = []
    build = lambda: calls.append(1) or f"fit-{len(calls)}"
    assert ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", build) == "fit-1"

    part.write_bytes(b"BBBB")  # same size, content changed
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    # restore directory mtimes exactly — the old XOR key saw no change
    os.utime(table, ns=dir_times)
    os.utime(sf_dir, ns=parent_times)

    assert ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", build) == "fit-2"
    assert len(calls) == 2


def test_part_added_invalidates(tmp_path):
    sf_dir, part = _make_corpus(tmp_path)
    calls = []
    build = lambda: calls.append(1) or len(calls)
    ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", build)
    (part.parent / "part-00001.parquet").write_bytes(b"more")
    ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", build)
    assert len(calls) == 2


def test_memo_is_lru_capped(tmp_path):
    """Hundreds of scratch corpora must not pin hundreds of fitted
    models: the memo holds at most _ML_MEMO_CAP entries, evicting the
    least recently used."""
    n = ml._ML_MEMO_CAP + 8
    dirs = []
    for i in range(n):
        sf_dir, _ = _make_corpus(tmp_path, name=f"sf{i}")
        dirs.append(str(sf_dir))
        ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", lambda: i)
    assert len(ml._ML_MEMO) == ml._ML_MEMO_CAP

    # the first corpora were evicted: a re-visit re-builds
    calls = []
    ml._memoized(_FakeSpark(), dirs[0], "tfidf", lambda: calls.append(1))
    assert calls == [1]

    # the most recent corpus is still a hit
    calls2 = []
    ml._memoized(_FakeSpark(), dirs[-1], "tfidf", lambda: calls2.append(1))
    assert calls2 == []


def test_lru_hit_refreshes_recency(tmp_path):
    """A memo HIT must move the entry to the back of the eviction
    queue, or a hot corpus gets evicted by cold scratch dirs."""
    hot, _ = _make_corpus(tmp_path, name="hot")
    ml._memoized(_FakeSpark(), str(hot), "tfidf", lambda: "hot-fit")
    for i in range(ml._ML_MEMO_CAP - 1):
        sf_dir, _ = _make_corpus(tmp_path, name=f"cold{i}")
        ml._memoized(_FakeSpark(), str(sf_dir), "tfidf", lambda: i)
        ml._memoized(_FakeSpark(), str(hot), "tfidf", lambda: "refit")
    # hot was touched between every insert — still cached
    calls = []
    got = ml._memoized(_FakeSpark(), str(hot), "tfidf", lambda: calls.append(1))
    assert got == "hot-fit" and calls == []


def test_missing_table_skips_memo(tmp_path):
    calls = []
    build = lambda: calls.append(1) or "direct"
    got = ml._memoized(_FakeSpark(), str(tmp_path / "nope"), "tfidf", build)
    assert got == "direct" and len(ml._ML_MEMO) == 0
