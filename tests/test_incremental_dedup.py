"""Mutated-index test for the incremental shard-vs-index near-dup
probe (text/dedup.dedup_incremental_minhash): append documents to the
index between two incremental runs and assert the verdicts stay
consistent, and that the second run still plans the cross-side band
equi-join only (no pair-space blowup, no eager shuffling job at
construction). Mirrors the reference's incremental FTS fill
(fts.py:63-80), which re-probes a GROWN index with the same query
plan.

The two corpus versions live in SEPARATE directories: the index is an
append-only sequence of immutable snapshots (exactly how a 100 TB
signature store evolves — new shards land as new files, old ones are
never rewritten), and the engine's per-path caches (_shingled) are
correct under that contract. Mutating parquet under a cached path is
out of contract for ANY cache keyed by analyzed plan.
"""

from __future__ import annotations

import pandas as pd

from economic_data_project_spark.registry import all_queries


def _letters(n: int) -> str:
    s = ""
    n += 1
    for _ in range(4):
        s += "abcdefghijklmnopqrstuvwxyz"[n % 26]
        n //= 26
    return s


def _doc_tokens(k: int) -> list[str]:
    """30 globally-unique letters-only tokens, namespaced per doc."""
    return [f"d{_letters(k)}x{_letters(i)}" for i in range(30)]


def _near_dup_of(k: int, salt: str) -> str:
    """Replace the last token of doc k's text: 30 tokens -> 28
    shingles, 3 trailing shingles change -> jaccard = 25/31 ~ 0.806,
    above the 0.5 verify threshold and deep in band-collision range
    (1-(1-0.806^3)^8 ~ 0.997; deterministic under the seeded hash
    constants — verified on this fixture)."""
    toks = _doc_tokens(k)
    toks[-1] = f"m{salt}{_letters(k)}"
    return " ".join(toks)


def _write_docs(path, texts_by_id) -> str:
    rows = [
        (i, t, "en", "fx", len(t)) for i, t in sorted(texts_by_id.items())
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(path / "documents.parquet"), index=False)
    return str(path)


def test_incremental_minhash_consistent_across_index_append(
    spark, tmp_path
):
    qs = all_queries()
    base = {k: " ".join(_doc_tokens(k)) for k in range(8)}

    # v1: index = docs 0..7 (split = 10*4 div 5 = 8), incoming = 8, 9.
    # 8 is a near-dup of indexed doc 3; 9 is novel.
    v1 = dict(base)
    v1[8] = _near_dup_of(3, "aa")
    v1[9] = " ".join(_doc_tokens(9))
    d1 = tmp_path / "v1"
    d1.mkdir()
    run1 = {
        r.doc_id: r
        for r in qs["dedup_incremental_minhash"](
            spark, _write_docs(d1, v1)
        ).collect()
    }
    assert set(run1) == {8, 9}
    assert not run1[8].is_new and run1[8].best_match_id == 3
    assert run1[8].best_jaccard >= 0.5
    assert run1[9].is_new and run1[9].n_dup_matches == 0

    # v2 = v1 + appended docs 10..12 (split = 13*4 div 5 = 10): the
    # former incoming shard is NOW PART OF THE INDEX. 10 duplicates
    # doc 9 (indexed only since the append), 11 duplicates doc 3 with
    # the exact mutation shape doc 8 carried in run 1, 12 is novel.
    v2 = dict(v1)
    v2[10] = _near_dup_of(9, "bb")
    v2[11] = _near_dup_of(3, "cc")
    v2[12] = " ".join(_doc_tokens(12))
    d2 = tmp_path / "v2"
    d2.mkdir()
    sf2 = _write_docs(d2, v2)

    sc = spark.sparkContext
    group = "incr-dedup-mutated-gate"
    sc.setJobGroup(group, "plan-construction only")
    try:
        df2 = qs["dedup_incremental_minhash"](spark, sf2)
    finally:
        sc.setJobGroup(None, None)
    # construction must not launch a shuffling job on the grown index
    tracker = sc.statusTracker()
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        assert info is not None and len(info.stageIds) == 1, (
            f"construction launched a shuffling job: {jid}"
        )
    phys = (
        df2._jdf.queryExecution()
        .toString()
        .split("== Physical Plan ==", 1)[1]
    )
    assert "CartesianProduct" not in phys
    # the only nested-loop joins allowed are the 1-row broadcast-scalar
    # split crossJoins (IdentityBroadcastMode on an aggregate, the
    # documented pattern) — never a doc-pair space
    for line in phys.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "split#" in line, line.strip()[:160]
    assert "band_val" in phys and "band_id" in phys

    run2 = {r.doc_id: r for r in df2.collect()}
    assert set(run2) == {10, 11, 12}
    # appended-to-index consistency: content that was novel in run 1
    # (doc 9) is findable once indexed ...
    assert not run2[10].is_new and run2[10].best_match_id == 9
    # ... and content that matched in run 1 still matches the SAME
    # canonical doc with the SAME jaccard (mutation shape identical),
    # now alongside its run-1 twin (8 is indexed too): 11 collides
    # with both 3 and 8.
    assert not run2[11].is_new
    assert run2[11].n_dup_matches >= 2
    assert run2[11].best_jaccard >= run1[8].best_jaccard
    assert run2[11].best_match_id in (3, 8)
    assert run2[12].is_new and run2[12].n_dup_matches == 0
