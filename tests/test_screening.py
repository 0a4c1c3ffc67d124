"""Value-level tests for corpus screening + sequence packing.

The synthetic documents table contains no PII (the driver oracle row for
``text_pii_scan`` is an all-zeros comparison), so the counting logic is
pinned here on a fixture corpus with PLANTED PII at known counts; the
packing operator is checked against its defining invariants plus a
hand-computed shard.
"""

from __future__ import annotations

import pandas as pd
import pytest

from economic_data_project_spark.registry import all_queries
from economic_data_project_spark.text.screening import (
    BIN_CAPACITY,
    N_SHARDS,
    pii_scan,
)

from .conftest import SF_DIR


def test_pii_scan_planted_counts(spark):
    rows = [
        (0, "contact me at john.doe@example.com or jane@mail.org now"),
        (1, "call 555-123-4567 or 555.987.6543 thanks"),
        (2, "account 123456789 at host 192.168.10.20"),
        (3, "nothing sensitive here at all"),
        (4, "mixed: a@b.io plus 999-555-1212 plus 00112233445566"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scan(docs).collect()}
    assert (got[0].n_email, got[0].pii_flag) == (2, True)
    assert (got[1].n_phone, got[1].pii_flag) == (2, True)
    # 123456789 is a long digit run; 192.168.10.20 is an ipv4 (its octet
    # digits are runs of <6 so they don't double-count as long runs)
    assert got[2].n_long_digit_run == 1
    assert got[2].n_ipv4 == 1
    assert got[3].pii_flag is False
    assert all(
        got[3][f] == 0
        for f in ("n_email", "n_phone", "n_long_digit_run", "n_ipv4")
    )
    assert (got[4].n_email, got[4].n_phone, got[4].n_long_digit_run) == (
        1,
        1,
        1,
    )


def test_pii_scan_registry_runs_all_zero_on_synthetic(spark):
    rows = all_queries()["text_pii_scan"](spark, SF_DIR).collect()
    assert len(rows) == 500
    # documents are lowercase word soup: the screen must report clean
    assert all(not r.pii_flag for r in rows)


def test_token_packing_invariants_and_golden_shard(spark):
    rows = all_queries()["doc_token_packing"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(rows) == docs.count()
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.shard == r.doc_id % N_SHARDS
        assert r.bin_id == r.start_offset // BIN_CAPACITY
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        # start offsets are the exclusive prefix sums of token counts
        cum = 0
        for r in shard_rows:
            assert r.start_offset == cum
            cum += r.n_tokens
        # bin ids are monotone within a shard
        bins = [r.bin_id for r in shard_rows]
        assert bins == sorted(bins)
    # hand-recompute one shard from raw text
    import re

    texts = {
        r.doc_id: r.text
        for r in docs.where(f"doc_id % {N_SHARDS} = 3").collect()
    }
    cum = 0
    for doc_id in sorted(texts):
        n = len(re.findall("[a-z]+", texts[doc_id].lower()))
        r = next(x for x in by_shard[3] if x.doc_id == doc_id)
        assert r.n_tokens == n
        assert r.start_offset == cum
        cum += n


def test_bin_stats_consistent_with_packing(spark):
    packing = all_queries()["doc_token_packing"](spark, SF_DIR).collect()
    stats = all_queries()["packing_bin_stats"](spark, SF_DIR).collect()
    agg: dict[tuple, list] = {}
    for r in packing:
        agg.setdefault((r.shard, r.bin_id), []).append(r.n_tokens)
    assert len(stats) == len(agg)
    for s in stats:
        toks = agg[(s.shard, s.bin_id)]
        assert s.n_docs == len(toks)
        assert s.bin_tokens == sum(toks)
        assert s.fill_ratio == pytest.approx(
            sum(toks) / BIN_CAPACITY, abs=0
        )
