"""Semantic unit tests for the round-7 training-data operators: value
assertions on crafted fixtures with hand-computed expectations (the
oracle sweep proves cross-engine parity; these prove the *semantics* —
a bug present in both the Spark query and its oracle SQL passes the
sweep but fails here)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from economic_data_project_spark.registry import all_queries


def _write_docs(tmp_path, rows):
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


# ------------------------------------------------- mixture weights


def test_mixture_weights_sqrt_flattening(spark, tmp_path):
    # src a: 1 doc x 4 tokens; src b: 4 docs x 4 tokens -> 1:4 token
    # ratio. sqrt flattening: weights 1:2 -> a=1/3, b=2/3; natural
    # shares 0.2/0.8; sampling factors 5/3 (upsample) and 5/6.
    rows = [(0, "aa bb cc dd", "en", "a", 11)]
    rows += [
        (i, "aa bb cc dd", "en", "b", 11) for i in range(1, 5)
    ]
    sf = _write_docs(tmp_path, rows)
    got = {
        r.source: r
        for r in all_queries()["corpus_mixture_weights"](
            spark, sf
        ).collect()
    }
    assert got["a"].src_tokens == 4 and got["b"].src_tokens == 16
    assert got["a"].token_share == pytest.approx(0.2)
    assert got["b"].token_share == pytest.approx(0.8)
    assert got["a"].mixture_weight == pytest.approx(1 / 3, abs=1e-6)
    assert got["b"].mixture_weight == pytest.approx(2 / 3, abs=1e-6)
    assert got["a"].sampling_factor == pytest.approx(5 / 3, abs=1e-5)
    assert got["b"].sampling_factor == pytest.approx(5 / 6, abs=1e-5)
    # expected_tokens preserves the total budget
    assert got["a"].expected_tokens + got["b"].expected_tokens == (
        pytest.approx(20, abs=1e-2)
    )


# ------------------------------------------------- budget selection


def test_budget_selection_boundary_is_exact(spark, tmp_path):
    # scores: doc 0 (4 distinct of 4 -> 1.0), doc 1 (2 of 4 -> 0.5),
    # doc 2 (1 of 4 -> 0.25). Each doc = 4 tokens, total 12, budget
    # = 12*3 div 5 = 7 -> cumulative in score order: 4, 8, 12 ->
    # ONLY doc 0 fits (doc 1 would land exactly at 8 > 7).
    sf = _write_docs(
        tmp_path,
        [
            (0, "aa bb cc dd", "en", "s", 11),
            (1, "aa aa bb bb", "en", "s", 11),
            (2, "aa aa aa aa", "en", "s", 11),
        ],
    )
    out = all_queries()["corpus_budget_selection"](spark, sf).collect()
    assert [r.doc_id for r in out] == [0]
    assert out[0].cum_tokens == 4 and out[0].token_budget == 7


def test_budget_selection_ties_break_by_doc_id(spark, tmp_path):
    # all docs same score (1.0), 4 tokens each, total 16 ->
    # budget 16*3 div 5 = 9 -> cumulative 4, 8, 12: docs 0 and 1 only,
    # in doc_id order within the tied score bucket.
    sf = _write_docs(
        tmp_path,
        [(i, "aa bb cc dd", "en", "s", 11) for i in range(4)],
    )
    out = all_queries()["corpus_budget_selection"](spark, sf).collect()
    assert [r.doc_id for r in out] == [0, 1]
    assert [r.cum_tokens for r in out] == [4, 8]


# ------------------------------------------------- normalized dedup


def test_normalized_exact_collapses_case_and_punct(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "Hello,  World!", "en", "s", 14),
            (1, "hello world", "en", "s", 11),
            (2, "hello there", "en", "s", 11),
        ],
    )
    got = {
        r.doc_id: r
        for r in all_queries()["dedup_normalized_exact"](
            spark, sf
        ).collect()
    }
    assert got[0].canonical_doc_id == 0 and not got[0].is_duplicate
    assert got[1].canonical_doc_id == 0 and got[1].is_duplicate
    assert got[2].canonical_doc_id == 2 and not got[2].is_duplicate


# ------------------------------------------------- substring spans


def test_substring_spans_finds_planted_boilerplate(spark, tmp_path):
    # 10-token docs sharing ONLY a 6-token boilerplate prefix ->
    # each doc has 6 positional 5-gram windows; windows 1 and 2 (inside
    # the shared prefix) are cross-doc dups, the rest are unique.
    boiler = "aa bb cc dd ee ff"
    sf = _write_docs(
        tmp_path,
        [
            (0, boiler + " gg hh ii jj", "en", "s", 1),
            (1, boiler + " kk ll mm nn", "en", "s", 1),
            (2, "oo pp qq rr ss tt uu vv ww xx", "en", "s", 1),
        ],
    )
    got = {
        r.doc_id: r
        for r in all_queries()["dedup_substring_spans"](
            spark, sf
        ).collect()
    }
    for d in (0, 1):
        assert got[d].n_spans == 6
        assert got[d].n_dup_spans == 2  # aa..ee and bb..ff
        assert got[d].has_cross_dup
        assert got[d].dup_span_ratio == pytest.approx(2 / 6, abs=1e-6)
    assert got[2].n_dup_spans == 0 and not got[2].has_cross_dup


def test_substring_spans_counts_positional_instances(spark, tmp_path):
    # the SAME 5-gram repeated twice inside doc 0 and once in doc 1:
    # positional counting must report BOTH of doc 0's instances as dup.
    span = "aa bb cc dd ee"
    sf = _write_docs(
        tmp_path,
        [
            (0, f"{span} {span}", "en", "s", 1),
            (1, span, "en", "s", 1),
        ],
    )
    got = {
        r.doc_id: r
        for r in all_queries()["dedup_substring_spans"](
            spark, sf
        ).collect()
    }
    # doc 0: 10 tokens -> 6 windows; windows at offsets 0 and 5 are the
    # planted span (cross-doc dup); the 4 straddling windows are unique
    # to doc 0 and appear once each -> not dups.
    assert got[0].n_spans == 6 and got[0].n_dup_spans == 2
    assert got[1].n_spans == 1 and got[1].n_dup_spans == 1


# ------------------------------------------------- int8 quantization


def test_quantization_known_vector(spark, tmp_path):
    pd.DataFrame(
        {
            "vec_id": [0, 1],
            "embedding": [
                [1.0, -0.5, 0.25, 0.0],
                [0.0, 0.0, 0.0, 0.0],  # zero vector: scale 0, all q=0
            ],
            "label": [0, 1],
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    got = {
        r.vec_id: r
        for r in all_queries()["embedding_int8_quant"](
            spark, str(tmp_path)
        ).collect()
    }
    r0 = got[0]
    # scale = 1/127 exactly representable ratios: 1.0 -> 127 (saturated);
    # -0.5 -> -63.5 + 0.5 = -63.0 -> floor -63; 0.25 -> 31.75 + 0.5 =
    # 32.25 -> floor 32; 0.0 -> 0 (all verified against IEEE doubles)
    assert r0.scale == pytest.approx(1 / 127, abs=1e-9)
    assert r0.n_sat == 1 and r0.n_zero == 1
    assert r0.q_sum == 127 - 63 + 32
    assert r0.q_l1 == 127 + 63 + 32
    # reconstruction error: |1 - 127*s|=0, |-0.5 + 63s|, |0.25 - 32s|, 0
    s = 1 / 127
    want_err = (abs(-0.5 + 63 * s) + abs(0.25 - 32 * s)) / 4
    assert r0.mean_abs_err == pytest.approx(want_err, abs=1e-9)
    r1 = got[1]
    assert r1.scale == 0.0 and r1.n_zero == 4 and r1.n_sat == 0
    assert r1.q_sum == 0 and r1.q_l1 == 0 and r1.mean_abs_err == 0.0


def test_quantization_preserves_cosine_direction(spark, tmp_path):
    # property: reconstructed vectors keep cosine ~1 vs the original
    # (the audit contract a pipeline would gate on before swapping the
    # serving store to int8)
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype("float32")
    pd.DataFrame(
        {
            "vec_id": range(50),
            "embedding": [v.tolist() for v in vecs],
            "label": [0] * 50,
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    rows = all_queries()["embedding_int8_quant"](
        spark, str(tmp_path)
    ).collect()
    for r in rows:
        v = vecs[r.vec_id].astype("float64")
        sc = max(abs(v)) / 127.0
        q = np.clip(np.floor(v / sc + 0.5), -127, 127)
        recon = q * sc
        cos = (v @ recon) / (
            math.sqrt(v @ v) * math.sqrt(recon @ recon)
        )
        assert cos > 0.9995
        # and the engine's audit columns match the NumPy transcription
        assert r.q_sum == int(q.sum()) and r.q_l1 == int(abs(q).sum())
        assert r.mean_abs_err == pytest.approx(
            float(abs(v - recon).mean()), abs=1e-9
        )


# ------------------------------------------------- shuffle order


def test_shuffle_order_is_deterministic_and_layout_free(spark, tmp_path):
    rows = [(i, f"doc {i}", "en", "s", 6) for i in range(200)]
    sf = _write_docs(tmp_path, rows)
    q = all_queries()["corpus_shuffle_order"]
    a = [(r.shard, r.pos_in_shard, r.doc_id) for r in q(spark, sf).collect()]
    b = [(r.shard, r.pos_in_shard, r.doc_id) for r in q(spark, sf).collect()]
    assert a == b  # reproducible across invocations
    # every doc appears exactly once, and the order is genuinely
    # shuffled (not doc_id order)
    assert sorted(d for _, _, d in a) == list(range(200))
    assert [d for _, _, d in a] != list(range(200))
    # positions are dense 1..n within each shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for sh, pos, _ in a:
        by_shard[sh].append(pos)
    for sh, ps in by_shard.items():
        assert ps == list(range(1, len(ps) + 1)), sh


# ------------------------------------------------- int8 ANN


def test_int8_ann_ranking_tracks_exact_ann(spark, tmp_path):
    """Quantized serving must agree with the float path on clearly
    separated neighbors: planted clusters where intra-cluster cosine
    ~0.99 and inter-cluster ~0.0 — int8 rounding (~0.4% error) cannot
    flip those, so the top-k sets must be identical cluster-mates."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for i in range(40):
        c = i % 4
        v = centers[c] + rng.normal(scale=0.02, size=16)
        vecs.append(v.astype("float32"))
        labels.append(c)
    pd.DataFrame(
        {
            "vec_id": range(40),
            "embedding": [v.tolist() for v in vecs],
            "label": labels,
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    rows = all_queries()["ann_cosine_topk_int8"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 50  # 10 probes x top-5
    for r in rows:
        # every retrieved neighbor is a cluster-mate of the probe
        assert r.neighbor_id % 4 == r.query_id % 4, r
        assert r.cosine_q > 0.9, r


# ------------------------------------------------- incremental dedup


def test_incremental_dedup_only_probes_existing_index(spark, tmp_path):
    """Planted shapes across the 80/20 doc_id split (split = 8 here):
    - incoming doc 8 near-dups EXISTING doc 0 -> flagged, best match 0
    - incoming doc 9 shares ~no shingles with any existing doc ->
      is_new with no match columns (the LEFT-join branch)
    """

    def doc(seed, edit=0):
        # QUADRATIC in position so distinct seeds share ~no shingles
        # (a linear formula walks one cycle offset by a constant —
        # background Jaccard ~1; same trap ADVICE r5 found in the old
        # minhash fixture)
        toks = [
            "w"
            + "".join(
                "abcdefghij"[int(c)]
                for c in str(
                    (
                        seed * 7919
                        + i * 104729
                        + 37 * i * i
                        + (edit if i % 37 == 0 else 0)
                    )
                    % 499
                )
            )
            for i in range(120)
        ]
        return " ".join(toks)

    rows = [(i, doc(i), "en", "s", 1) for i in range(8)]  # existing
    rows.append((8, doc(0, edit=1), "en", "s", 1))  # near-dups doc 0
    rows.append((9, doc(99), "en", "s", 1))  # unique vs existing
    sf = _write_docs(tmp_path, rows)
    got = {
        r.doc_id: r
        for r in all_queries()["dedup_incremental_minhash"](
            spark, sf
        ).collect()
    }
    assert set(got) == {8, 9}  # exactly the incoming universe
    assert not got[8].is_new
    assert got[8].best_match_id == 0 and got[8].best_jaccard > 0.5
    assert got[9].is_new and got[9].n_dup_matches == 0
    assert got[9].best_match_id is None


# -------------------------------- oracle parity on hostile fixtures
# The driver corpus is pure lowercase single-space words, which masks
# engine-divergence on punctuated/degenerate text (code-review r7):
# DuckDB's regexp_replace replaces only the first match without 'g',
# and its array_to_string of an empty slice is NULL where Spark's
# concat_ws is ''. These run the REAL query-vs-oracle compare on
# corpora that exercise exactly those branches.


def _oracle_parity(spark, name, sf):
    import duckdb

    from economic_data_project_spark.registry import all_oracles

    from .conftest import compare_with_oracle

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM '{sf}/documents.parquet'"
    )
    ok, msg = compare_with_oracle(
        spark, all_queries()[name], all_oracles()[name], sf, con=con
    )
    assert ok, f"{name}: {msg}"


def test_normalized_dedup_oracle_parity_on_punctuation(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "Hello,  World! (again)", "en", "s", 1),
            (1, "hello world again", "en", "s", 1),
            (2, "UPPER.case;text", "en", "s", 1),
            (3, "12345 !!!", "en", "s", 1),  # digits + punct only
        ],
    )
    _oracle_parity(spark, "dedup_normalized_exact", sf)


def test_substring_spans_oracle_parity_on_degenerate_docs(
    spark, tmp_path
):
    sf = _write_docs(
        tmp_path,
        [
            (0, "aa bb cc dd ee ff gg", "en", "s", 1),
            (1, "12345 67890", "en", "s", 1),  # zero alpha tokens
            (2, "", "en", "s", 1),  # empty text
            (3, "aa bb", "en", "s", 1),  # shorter than the window
        ],
    )
    _oracle_parity(spark, "dedup_substring_spans", sf)


# ------------------------------------------------- leakage-safe split


def test_leakage_safe_split_keeps_clusters_together(spark):
    from collections import defaultdict

    from .conftest import SF_DIR

    rows = all_queries()["leakage_safe_split"](spark, SF_DIR).collect()
    # every document assigned exactly one split
    assert all(r.split in ("train", "val", "test") for r in rows)
    # THE invariant: a near-dup cluster never straddles splits
    by_canonical = defaultdict(set)
    n_clustered = 0
    for r in rows:
        by_canonical[r.canonical_id].add(r.split)
        n_clustered += bool(r.in_cluster)
    assert all(len(s) == 1 for s in by_canonical.values())
    # the invariant is non-vacuous on this corpus (real clusters exist)
    assert n_clustered > 0
    from collections import Counter

    sizes = Counter(r.canonical_id for r in rows)
    assert any(n > 1 for n in sizes.values()), (
        "no multi-doc cluster in fixture — test is vacuous"
    )
    # split fractions are in the right ballpark (hash-gate, 0.8/0.1/0.1)
    from collections import Counter

    frac = Counter(r.split for r in rows)
    assert frac["train"] / len(rows) > 0.6
    assert frac["val"] / len(rows) < 0.25
    assert frac["test"] / len(rows) < 0.25


# ------------------------------------------------- CDC chunking


def test_cdc_chunks_survive_a_prefix_insertion(spark, tmp_path):
    """The CDC property: prepending text disturbs only the chunks up
    to the first boundary after the edit; later chunks re-align to the
    same hashes. Fixed-offset chunking shares ~nothing after a shift —
    CDC must share most of the chunk multiset."""
    import hashlib as h

    base = " ".join(
        "w" + h.md5(str(i).encode()).hexdigest()[:6] for i in range(120)
    )
    sf = _write_docs(
        tmp_path,
        [
            (0, base, "en", "s", 1),
            (1, "INSERTED PREFIX " + base, "en", "s", 1),
        ],
    )
    rows = all_queries()["cdc_chunking"](spark, sf).collect()
    chunks = {0: [], 1: []}
    for r in rows:
        chunks[r.doc_id].append(r.chunk_hash)
    # sanity: real chunking happened (not one whole-doc chunk)
    assert len(chunks[0]) > 10
    shared = set(chunks[0]) & set(chunks[1])
    # nearly all of doc 0's chunks re-appear in the shifted doc
    assert len(shared) >= len(set(chunks[0])) - 2, (
        len(shared),
        len(set(chunks[0])),
    )
    # and the chunk geometry reconstructs the document: lengths sum to
    # full text length
    lens = sum(r.chunk_len for r in rows if r.doc_id == 0)
    assert lens == len(base)


def test_cdc_degenerate_docs(spark, tmp_path):
    # shorter-than-window and empty docs are one whole-text chunk
    sf = _write_docs(
        tmp_path,
        [(0, "short", "en", "s", 1), (1, "", "en", "s", 1)],
    )
    rows = all_queries()["cdc_chunking"](spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0].chunk_len == 5
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_len == 0


# ------------------------------------------------- char-trigram LM


def test_char_trigram_quality_flags_gibberish(spark, tmp_path):
    typical = "the quick brown fox jumps over the lazy dog and runs on"
    rows = [(i, typical, "en", "s", 1) for i in range(20)]
    rows.append((20, "zq xv jk qz wx vq kj zx qv jz", "en", "s", 1))
    rows.append((21, "", "en", "s", 1))  # no trigrams
    sf = _write_docs(tmp_path, rows)
    got = {
        r.doc_id: r
        for r in all_queries()["char_trigram_quality"](
            spark, sf
        ).collect()
    }
    # gibberish is far more surprising under the corpus model than the
    # text the model was dominated by
    assert got[20].cross_entropy > got[0].cross_entropy + 1.0
    # empty doc: surfaced, not dropped; no trigrams, NULL score
    assert got[21].n_trigrams == 0 and got[21].cross_entropy is None


# ------------------------------------------------- JS divergence


def test_source_js_divergence_bounds(spark, tmp_path):
    # identical distributions -> JS ~ 0; disjoint vocab -> JS = ln(2)
    # two corpus versions in SEPARATE dirs: the vocab count frame is
    # cached per path (r9), and mutating parquet under a cached path
    # is out of contract for any plan-keyed cache (same discipline as
    # tests/test_incremental_dedup.py — an index grows as immutable
    # snapshots)
    d1 = tmp_path / "v1"
    d1.mkdir()
    rows = []
    for i in range(5):
        rows.append((i, "aa bb cc dd", "en", "same1", 1))
        rows.append((10 + i, "aa bb cc dd", "en", "same2", 1))
        rows.append((20 + i, "xx yy zz ww", "en", "other", 1))
    sf = _write_docs(d1, rows)
    got = {
        (r.source_a, r.source_b): r
        for r in all_queries()["source_js_divergence"](
            spark, sf
        ).collect()
    }
    import math

    assert got[("same1", "same2")].js_divergence == pytest.approx(
        0.0, abs=1e-6
    )
    # disjoint pairs share no terms -> no intersection row survives the
    # equi-join; the pair is absent (documented: JS would be exactly
    # ln(2), and a pair with zero shared terms carries no signal beyond
    # "disjoint")
    assert ("same1", "other") not in got
    # near-disjoint: one shared term keeps the pair with JS near ln(2)
    rows.append((30, "xx qq rr ss", "en", "mixed", 1))
    d2 = tmp_path / "v2"
    d2.mkdir()
    sf2 = _write_docs(d2, rows)
    got2 = {
        (r.source_a, r.source_b): r
        for r in all_queries()["source_js_divergence"](
            spark, sf2
        ).collect()
    }
    js = got2[("mixed", "other")].js_divergence
    assert 0.5 < js <= math.log(2) + 1e-9


# ------------------------------------------------- training manifest


def test_training_manifest_composition_invariants(spark):
    from .conftest import SF_DIR

    man = all_queries()["corpus_training_manifest"](
        spark, SF_DIR
    ).collect()
    keep = {
        r.doc_id
        for r in all_queries()["corpus_keep_list"](spark, SF_DIR)
        .where("keep")
        .collect()
    }
    # exactly the kept docs, each once
    ids = [r.doc_id for r in man]
    assert set(ids) == keep and len(ids) == len(keep)
    # offsets are contiguous token runs within every (split, shard):
    # start_offset(k) = start_offset(k-1) + n_tokens(k-1), from 0
    from collections import defaultdict

    lanes = defaultdict(list)
    for r in man:
        lanes[(r.split, r.shard)].append(r)
    for lane in lanes.values():
        lane.sort(key=lambda r: r.pos_in_shard)
        off = 0
        for k, r in enumerate(lane, start=1):
            assert r.pos_in_shard == k
            assert r.start_offset == off
            assert r.bin_id == off // 512
            off += r.n_tokens
    # bins never mix splits (holds by construction of the lanes)
    assert all(r.split in ("train", "val", "test") for r in man)


# ------------------------------------------- budget-selection property


def _naive_budget_reference(rows):
    """Naive global-window semantics (what the DuckDB oracle states):
    order by (score DESC, doc_id), cumulative tokens, keep while
    cum <= total * 3 // 5."""
    total = sum(n for _, n, _ in rows)
    budget = (total * 3) // 5
    out, cum = [], 0
    for doc_id, n_tokens, score in sorted(
        rows, key=lambda r: (-r[2], r[0])
    ):
        cum += n_tokens
        if cum <= budget:
            out.append((doc_id, score, n_tokens, cum, budget))
    return out


def test_budget_selection_decomposition_matches_naive_reference(spark):
    """Property test for the bucket-decomposed global cumsum
    (selection._budget_select): Hypothesis drives the EXACT production
    plan with adversarial score/token distributions and asserts exact
    equality with the naive single-window reference — especially at
    quantized-score TIES (small score alphabet forces multi-doc
    buckets), zero-token docs, and budgets landing exactly on a row
    boundary. Scores come from the 6-decimal grid as Python doubles,
    so both sides compare identical IEEE values (no cross-engine float
    question here — that's the oracle sweep's job)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from economic_data_project_spark.text.selection import (
        _budget_select,
    )

    # small score alphabet on the 6-decimal grid -> guaranteed ties
    grid = st.sampled_from(
        [0, 1, 250_000, 500_000, 999_999, 1_000_000]
    )
    rows_strategy = st.lists(
        st.tuples(st.integers(min_value=0, max_value=60), grid),
        min_size=1,
        max_size=25,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows_strategy)
    def run(case):
        rows = [
            (i, n, g / 1e6) for i, (n, g) in enumerate(case)
        ]
        scored = spark.createDataFrame(
            rows, "doc_id long, n_tokens long, score double"
        ).select("doc_id", "n_tokens", "score")
        got = [
            (r.doc_id, r.score, r.n_tokens, r.cum_tokens, r.token_budget)
            for r in _budget_select(scored).collect()
        ]
        assert got == _naive_budget_reference(rows)

    run()


def test_cdc_matches_pure_python_reference_on_random_corpus(
    spark, tmp_path
):
    """Randomized cross-check: the full (chunk_idx, chunk_len,
    chunk_hash) output must equal an independent pure-Python CDC
    chunker on a seeded adversarial corpus — lengths straddling the
    window width (0, 1, K-1, K, K+1), boundary-dense and boundary-free
    regions, repeated content, and a non-ASCII codepoint (split(text,
    \'\') and Python slicing must agree on CHARACTER positions, and
    md5 must hash the same UTF-8 bytes)."""
    import hashlib
    import random

    from economic_data_project_spark.text.cdc import (
        _BOUNDARY_HI,
        _K_WIN,
    )

    def reference(text: str):
        n = len(text)
        bounds = [
            i
            for i in range(1, max(n - _K_WIN + 1, 1) + 1)
            if i <= n - _K_WIN + 1
            and hashlib.md5(
                text[i - 1 : i - 1 + _K_WIN].encode("utf-8")
            ).hexdigest()[:2]
            < _BOUNDARY_HI
        ]
        starts = [1] + [b + 1 for b in bounds]
        ends = bounds + [n]
        out = []
        for idx, (s, e) in enumerate(zip(starts, ends), start=1):
            piece = text[s - 1 : max(e, s - 1)] if e >= s else ""
            out.append(
                (
                    idx,
                    max(e - s + 1, 0),
                    hashlib.md5(piece.encode("utf-8")).hexdigest(),
                )
            )
        return out

    rng = random.Random(20260815)
    alphabet = "abcdefgh XY.,\u00e9"
    rows = []
    lengths = [0, 1, _K_WIN - 1, _K_WIN, _K_WIN + 1] + [
        rng.randrange(2, 400) for _ in range(40)
    ]
    for d, ln in enumerate(lengths):
        text = "".join(rng.choice(alphabet) for _ in range(ln))
        if d % 7 == 3 and ln > 20:  # repeated content stretches
            text = text[:10] * (ln // 10)
        rows.append((d, text, "en", "s", len(text)))
    sf = _write_docs(tmp_path, rows)

    got = {}
    for r in all_queries()["cdc_chunking"](spark, sf).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_len, r.chunk_hash)
        )
    for d, text, *_ in rows:
        want = reference(text)
        assert sorted(got[d]) == want, (d, repr(text[:40]))
        # partition invariant: chunk lengths reconstruct the document
        assert sum(c[1] for c in want) == len(text)

