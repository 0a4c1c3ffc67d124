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


def test_contamination_planted_canaries(spark):
    from economic_data_project_spark.text.screening import (
        benchmark_contamination,
    )
    import economic_data_project_spark.text.screening as scr

    # run the registered query on a corpus where the answer is known
    rows = [
        (0, "the row column sort trick plus stream table hash combo"),
        (1, "clean text with no canaries anywhere in sight today"),
        (2, "window fast query window fast query repeated twice"),
    ]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "fixture"
    pdf["n_chars"] = pdf["text"].str.len()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        got = {
            r.doc_id: r for r in benchmark_contamination(spark, d).collect()
        }
    assert got[0].n_canary_hits == 2
    assert got[0].matched_canaries == "row column sort, stream table hash"
    assert got[1].n_canary_hits == 0 and not got[1].contaminated
    assert got[1].matched_canaries == ""
    # distinct shingles: the repeated canary counts once
    assert got[2].n_canary_hits == 1 and got[2].contaminated


def test_repetition_scores_extremes(spark):
    from economic_data_project_spark.text.screening import (
        text_repetition_scores,
    )
    import pandas as pd
    import tempfile, os

    rows = [
        (0, "spam " * 50),  # one token repeated: max repetition
        # all-distinct alpha words (the tokenizer is [a-z]+, so no digits)
        (1, " ".join(
            "w" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(60)
        )),
        (2, "1234 5678 !!!"),  # zero alpha tokens: must still get a row
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "fixture"
    pdf["n_chars"] = pdf["text"].str.len()
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        got = {
            r.doc_id: r for r in text_repetition_scores(spark, d).collect()
        }
    assert got[0].top_token_ratio == 1.0
    assert got[0].dup_shingle_ratio > 0.9
    assert got[0].repetition_flag
    assert got[1].top_token_ratio < 0.05
    assert got[1].dup_shingle_ratio == 0.0
    assert not got[1].repetition_flag
    # tokenless doc keeps a row with a clean default verdict
    assert got[2].top_token_ratio == 0.0
    assert not got[2].repetition_flag


def test_corpus_filter_verdict_consistency(spark):
    """The composite keep verdict must equal the AND of its four
    component screens, row for row."""
    qs = all_queries()
    verdict = {r.doc_id: r for r in qs["corpus_filter_verdict"](spark, SF_DIR).collect()}
    quality = {r.doc_id: r.quality_bucket for r in qs["text_quality_scores"](spark, SF_DIR).collect()}
    rep = {r.doc_id: r.repetition_flag for r in qs["text_repetition_scores"](spark, SF_DIR).collect()}
    pii = {r.doc_id: r.pii_flag for r in qs["text_pii_scan"](spark, SF_DIR).collect()}
    con = {r.doc_id: r.contaminated for r in qs["benchmark_contamination"](spark, SF_DIR).collect()}
    assert set(verdict) == set(quality)
    for d, v in verdict.items():
        expect = (
            quality[d] == "keep"
            and not rep[d]
            and not pii[d]
            and not con[d]
        )
        assert v.keep == expect, d
    # both outcomes occur on the synthetic corpus
    keeps = {v.keep for v in verdict.values()}
    assert keeps == {True, False}


def test_bin_id_integer_div_exact_above_2e53(spark):
    """The 2^53 boundary contract for the shared bin assignment
    (screening.bin_id_expr, used by doc_token_packing,
    packing_bin_stats and corpus_training_manifest): at
    start_offset = 2**54 - 1 the old float path rounds the offset UP
    to 2**54 (not representable in double) and floor(x / 512.0)
    lands one bin too high, while integer `div` matches Python's //
    exactly. A 100 TB corpus (~2.5e13 tokens/shard is reachable with
    few shards) makes this a real boundary, not a theoretical one."""
    from pyspark.sql import functions as F

    from economic_data_project_spark.text.screening import bin_id_expr

    offsets = [
        2**54 - 1,           # the divergence point
        2**54,
        2**53 - 1,           # below the double-precision cliff: agree
        511, 512, 0,         # small boundaries: agree
    ]
    df = spark.createDataFrame(
        [(o,) for o in offsets], "start_offset long"
    ).select(
        "start_offset",
        bin_id_expr("start_offset").alias("bin_div"),
        F.floor(F.col("start_offset") / float(BIN_CAPACITY))
        .cast("long")
        .alias("bin_float"),
    )
    got = {r.start_offset: r for r in df.collect()}
    for o in offsets:
        # the production path == exact integer semantics, at EVERY offset
        assert got[o].bin_div == o // BIN_CAPACITY, o
    # the float path demonstrably shifts the boundary row above 2^53 ...
    assert got[2**54 - 1].bin_float == got[2**54 - 1].bin_div + 1
    # ... and is only safe below it
    for o in (2**53 - 1, 511, 512, 0):
        assert got[o].bin_float == got[o].bin_div, o
