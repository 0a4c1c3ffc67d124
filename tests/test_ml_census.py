"""Driver-visible censuses over the rows-only ML surfaces (VERDICT r12
brief #4): the oracle sweep (tests/test_oracle.py) already runs each
census against DuckDB at the sweep scale; these pin the pieces the
sweep can't see — the embedded stop list's identity with the production
default, and the featurization-census semantics on a crafted corpus
that exercises the tokenizer/df boundaries."""

from __future__ import annotations

import pandas as pd

from economic_data_project_spark.registry import all_oracles, all_queries
from economic_data_project_spark.text.ml import _ENGLISH_STOPWORDS


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


def test_embedded_stoplist_is_the_production_default(spark):
    """The oracle's embedded stop list must be byte-identical to
    StopWordsRemover's default English resource — the census certifies
    the PRODUCTION pipeline, so drift here would silently verify a
    different filter than the one the ML queries run."""
    from pyspark.ml.feature import StopWordsRemover

    assert list(_ENGLISH_STOPWORDS) == (
        StopWordsRemover.loadDefaultStopWords("english")
    )


def test_vocab_census_tokenizer_and_df_boundaries(spark, tmp_path):
    """Crafted corpus driving every boundary the census certifies:
    - a 26-letter run splits 20+6 (greedy non-overlapping {3,20});
    - 1-2 letter fragments never tokenize;
    - stopwords drop BEFORE bigram formation (bigrams bridge them);
    - df=1 grams are excluded (minDF=2);
    - a gram in >85% of docs is excluded (maxDF), one at exactly 80%
      is kept."""
    from tests.conftest import compare_with_oracle, duckdb_connect

    common = "sharedword "  # in all 10 docs -> df=10 > 8.5 -> excluded
    mostly = "mostlyword "  # in 8 docs -> 8 <= 8.5 -> kept
    texts = []
    for i in range(10):
        t = common
        if i < 8:
            t += mostly
        if i < 2:
            # stopword 'the' between alpha/beta: the bigram must form
            # over the FILTERED sequence ('alpha beta')
            t += "alpha the beta "
        if i == 0:
            t += "abcdefghijklmnopqrstuvwxyz ab x "  # 20+6 split, frags
            t += "uniquegram "  # df=1 -> excluded
        texts.append(t.strip())
    sf = _write_docs(tmp_path, texts)
    con = duckdb_connect(sf)
    try:
        ok, msg = compare_with_oracle(
            spark,
            all_queries()["doc_ml_vocab_census"],
            all_oracles()["doc_ml_vocab_census"],
            sf,
            con=con,
        )
    finally:
        con.close()
    assert ok, msg
    row = all_queries()["doc_ml_vocab_census"](spark, sf).collect()[0]
    assert row.n_docs == 10
    # eligible (6): mostlyword (df=8), alpha/beta/'alpha beta' (df=2),
    # and the bigrams 'sharedword mostlyword' (df=8 — the maxDF
    # exclusion of sharedword does NOT remove bigrams containing it)
    # and 'mostlyword alpha' (df=2). Excluded: sharedword (df=10 >
    # 8.5), uniquegram / abcdefghijklmnopqrst / uvwxyz and the doc-0
    # tail bigrams (df=1), ab/x (under 3 chars), 'the' (stopword —
    # and 'alpha beta' proves the bigram bridged it).
    assert row.vocab_size == 6


def test_vocab_census_is_total_on_empty_vocabulary(spark, tmp_path):
    """A corpus where every gram lands outside the DF window (all
    shared grams exceed maxDF, the rest are df=1) fits an EMPTY
    vocabulary; the census must emit vocab_size=0 and match the
    oracle's 0 rather than crash in cv_model.transform (the census
    stops at the CountVectorizer fit for exactly this reason)."""
    from tests.conftest import compare_with_oracle, duckdb_connect

    texts = [
        f"alpha beta gamma uniq{'x' * (i + 1)}" for i in range(10)
    ]
    sf = _write_docs(tmp_path, texts)
    con = duckdb_connect(sf)
    try:
        ok, msg = compare_with_oracle(
            spark,
            all_queries()["doc_ml_vocab_census"],
            all_oracles()["doc_ml_vocab_census"],
            sf,
            con=con,
        )
    finally:
        con.close()
    assert ok, msg
    row = all_queries()["doc_ml_vocab_census"](spark, sf).collect()[0]
    assert row.vocab_size == 0


def test_ml_memo_invalidates_on_corpus_rewrite(spark, tmp_path):
    """The fitted-surface memo keys on the corpus mtime (catalog
    schema-cache discipline): rewriting the parquet at the SAME path
    must re-fit, not serve the stale surface."""
    import time

    sf = _write_docs(
        tmp_path,
        [f"alpha beta gamma delta{i % 3} epsilon" for i in range(40)],
    )
    v1 = all_queries()["doc_ml_vocab_census"](spark, sf).collect()[0]
    assert v1.n_docs == 40
    time.sleep(0.05)
    _write_docs(
        tmp_path,
        [f"omega psi chi{i % 5} epsilon zeta" for i in range(80)],
    )
    v2 = all_queries()["doc_ml_vocab_census"](spark, sf).collect()[0]
    assert v2.n_docs == 80


def test_idf_census_matches_oracle_and_formula(spark, tmp_path):
    """The weighting census (VERDICT r13 #4) on the same boundary
    corpus as the vocab census: oracle hash-match plus an independent
    Python recomputation of Spark ML's idf formula
    ln((m+1)/(df+1)) over the KNOWN per-term document frequencies —
    a wrong smoothing constant, log base, or df would shift the sum."""
    import math
    from decimal import Decimal

    from tests.conftest import compare_with_oracle, duckdb_connect

    common = "sharedword "
    mostly = "mostlyword "
    texts = []
    for i in range(10):
        t = common
        if i < 8:
            t += mostly
        if i < 2:
            t += "alpha the beta "
        if i == 0:
            t += "abcdefghijklmnopqrstuvwxyz ab x uniquegram "
        texts.append(t.strip())
    sf = _write_docs(tmp_path, texts)
    con = duckdb_connect(sf)
    try:
        ok, msg = compare_with_oracle(
            spark,
            all_queries()["doc_idf_census"],
            all_oracles()["doc_idf_census"],
            sf,
            con=con,
        )
    finally:
        con.close()
    assert ok, msg
    row = all_queries()["doc_idf_census"](spark, sf).collect()[0]
    assert (row.n_docs, row.vocab_size) == (10, 6)
    # known dfs (see the vocab-census test): mostlyword and the bigram
    # 'sharedword mostlyword' at df=8; alpha, beta, 'alpha beta' and
    # 'mostlyword alpha' at df=2
    dfs = [8, 8, 2, 2, 2, 2]
    assert row.df_total == sum(dfs)
    q9 = Decimal("0.000000001")
    expected = sum(
        (
            Decimal(str(round(math.log(11.0 / (d + 1.0)), 9))).quantize(q9)
            for d in dfs
        ),
        Decimal(0),
    )
    assert row.idf_sum_9dp == float(expected)


def test_idf_census_cap_has_headroom_at_test_scales(spark):
    """DATA-PINNED guard: the census is content-exact only while the
    eligible vocabulary stays under the 20000 cap (at the cap the
    tie-broken term CHOICE may differ cross-engine). Measured 820-842
    at every test SF — fail loudly if a regenerated corpus approaches
    the cap instead of letting the census go flaky."""
    from economic_data_project_spark.text.ml import VOCAB_SIZE

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        row = all_queries()["doc_idf_census"](spark, sf_dir).collect()[0]
        assert row.vocab_size < 0.5 * VOCAB_SIZE, (
            f"{sf_dir}: fitted vocab {row.vocab_size} within 2x of the"
            f" {VOCAB_SIZE} cap — the IDF/vocab censuses lose"
            " content-exactness at the cap; re-pin the expectation"
        )


def test_idf_census_is_total_on_empty_vocabulary(spark, tmp_path):
    """Same totality discipline as the vocab census: an all-excluded
    corpus (shared grams over maxDF, the rest df=1) must census as
    zero terms / zero df / zero weight sum rather than crash in
    cv_model.transform, and the oracle's COALESCEd SUMs must match."""
    from tests.conftest import compare_with_oracle, duckdb_connect

    texts = [
        f"alpha beta gamma uniq{'x' * (i + 1)}" for i in range(10)
    ]
    sf = _write_docs(tmp_path, texts)
    con = duckdb_connect(sf)
    try:
        ok, msg = compare_with_oracle(
            spark,
            all_queries()["doc_idf_census"],
            all_oracles()["doc_idf_census"],
            sf,
            con=con,
        )
    finally:
        con.close()
    assert ok, msg
    row = all_queries()["doc_idf_census"](spark, sf).collect()[0]
    assert (row.n_docs, row.vocab_size, row.df_total) == (10, 0, 0)
    assert row.idf_sum_9dp == 0.0


def test_kmeans_assign_census_matches_oracle_and_numpy(spark, tmp_path):
    """The assignment census (VERDICT r14 #3) on a crafted corpus with
    clear cluster structure: oracle hash-match (DuckDB recomputes
    tf-idf, distances, and argmin from the emitted centroids) PLUS an
    independent NumPy recomputation of the engine side — per-doc
    argmin over the model's own centers from the collected feature
    vectors must equal every prediction, and the quantized distance
    sums must rebuild exactly."""
    from decimal import Decimal

    import numpy as np
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from tests.conftest import compare_with_oracle, duckdb_connect
    from economic_data_project_spark.text.ml import (
        _features,
        _kmeans_model,
    )

    # three lexical families so k-means has real structure; enough
    # docs that every family passes min_df
    fam = [
        "apples oranges market fruit vendor prices",
        "engine piston torque gearbox chassis motor",
        "sonata violin orchestra tempo concerto melody",
    ]
    texts = [
        f"{fam[i % 3]} filler{'x' * (i % 4)} common shared corpus"
        for i in range(18)
    ]
    sf = _write_docs(tmp_path, texts)
    con = duckdb_connect(sf)
    try:
        ok, msg = compare_with_oracle(
            spark,
            all_queries()["doc_kmeans_assign_census"],
            all_oracles()["doc_kmeans_assign_census"],
            sf,
            con=con,
        )
    finally:
        con.close()
    assert ok, msg

    # engine-side golden: numpy argmin over the model's centers
    feats, _vocab = _features(spark, sf)
    model = _kmeans_model(spark, sf)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    got = (
        model.transform(feats)
        .select(
            "doc_id",
            "prediction",
            vector_to_array(F.col("features")).alias("x"),
        )
        .collect()
    )
    q6 = Decimal("0.000001")
    sums: dict[int, Decimal] = {}
    for r in got:
        x = np.asarray(r.x)
        d2 = ((centers - x) ** 2).sum(axis=1)
        assert int(d2.argmin()) == r.prediction, r.doc_id
        sums[r.prediction] = sums.get(r.prediction, Decimal(0)) + Decimal(
            str(round(float(d2[r.prediction]), 6))
        ).quantize(q6)
    census = {
        r.cluster: r
        for r in all_queries()["doc_kmeans_assign_census"](
            spark, sf
        ).collect()
    }
    assert set(census) == set(sums)
    for c, s in sums.items():
        assert census[c].dist_sum_6dp == float(s), c


def test_kmeans_assign_census_stale_scratch_fails_loudly(spark, tmp_path):
    """A stale centroid scratch (written for a DIFFERENT corpus) must
    yield ZERO oracle rows — a loud row-count mismatch, never a silent
    pass: every scratch row carries a content-sharp corpus_key the
    oracle recomputes and filters on."""
    from tests.conftest import duckdb_connect
    from economic_data_project_spark.registry import all_oracles

    (tmp_path / "a").mkdir(exist_ok=True)
    (tmp_path / "b").mkdir(exist_ok=True)
    # 8 doc groups (df=2 each) so the corpus has >= K distinct
    # feature vectors for the k=8 fit; group tokens are LETTER runs
    # (the tokenizer pattern [a-zA-Z]{3,20} drops digits, so 'doc0'
    # would collapse to 'doc' at df=n and vanish under maxDF)
    sf_a = _write_docs(
        tmp_path / "a",
        [
            f"apples oranges market fruit grp{'q' * (i % 8 + 1)}"
            for i in range(16)
        ],
    )
    sf_b = _write_docs(
        tmp_path / "b",
        [
            f"engine piston torque gearbox grp{'z' * (i % 8 + 1)}"
            for i in range(16)
        ],
    )
    # run the census on corpus A -> scratch now holds A's centroids
    all_queries()["doc_kmeans_assign_census"](spark, sf_a).collect()
    # oracle evaluated against corpus B sees a non-matching corpus_key
    con = duckdb_connect(sf_b)
    try:
        rows = con.execute(
            all_oracles()["doc_kmeans_assign_census"]
        ).fetchall()
    finally:
        con.close()
    assert rows == []


def test_kmeans_assign_margin_has_tolerance_headroom(spark):
    """DATA-PINNED guard for the assignment census: the engine's
    prediction comes from Spark's findClosest (norm-expanded
    fastSquaredDistance, ~1e-6 relative precision) while the oracle
    and the census's own distance column compute exactly — a doc whose
    best-vs-second-best margin sits inside the tolerance could flip
    argmin cross-engine. Measure the minimum relative margin at the
    test SFs and fail loudly if a regenerated corpus approaches the
    bound (re-pin the census, don't let it go flaky)."""
    import numpy as np
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from economic_data_project_spark.text.ml import (
        _features,
        _kmeans_model,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        feats, _vocab = _features(spark, sf_dir)
        model = _kmeans_model(spark, sf_dir)
        centers = np.stack(
            [np.asarray(c) for c in model.clusterCenters()]
        )
        xs = (
            feats.select(vector_to_array(F.col("features")).alias("x"))
            .collect()
        )
        min_margin = float("inf")
        for r in xs:
            x = np.asarray(r.x)
            d2 = np.sort(((centers - x) ** 2).sum(axis=1))
            rel = (d2[1] - d2[0]) / max(float(d2[1]), 1e-30)
            min_margin = min(min_margin, rel)
        assert min_margin > 1e-3, (
            f"{sf_dir}: min relative argmin margin {min_margin:.2e}"
            " within 1000x of Spark's 1e-6 fast-distance tolerance —"
            " the assignment census loses cross-engine exactness"
        )


def test_kmeans_assign_census_total_on_zero_vector_docs(spark, tmp_path):
    """Docs that tokenize to NOTHING (digits/short fragments) carry
    zero feature vectors; a cluster made of them has an all-zero
    centroid, which emits no nonzero scratch rows — the per-cluster
    SENTINEL row is what keeps that cluster visible to the oracle
    (without it the oracle reassigns those docs and the census
    false-fails on a correct engine)."""
    import numpy as np

    from tests.conftest import compare_with_oracle, duckdb_connect
    from economic_data_project_spark.text.ml import _kmeans_model

    # exactly K distinct feature points: 7 lexical groups plus the
    # zero point — the seeded fit then dedicates one centroid to the
    # zero-vector docs
    texts = [
        f"apples oranges market fruit grp{'w' * (i % 7 + 1)}"
        for i in range(14)
    ] + ["12 34 56 !!"] * 6  # tokenize to zero vectors
    sf = _write_docs(tmp_path, texts)
    con = duckdb_connect(sf)
    try:
        ok, msg = compare_with_oracle(
            spark,
            all_queries()["doc_kmeans_assign_census"],
            all_oracles()["doc_kmeans_assign_census"],
            sf,
            con=con,
        )
    finally:
        con.close()
    assert ok, msg
    # pin that the fixture genuinely exercises the all-zero-centroid
    # path (seeded fit -> deterministic); if a pipeline change stops
    # producing one, this assert flags the fixture, not the engine
    centers = _kmeans_model(spark, sf).clusterCenters()
    assert any(
        not np.any(np.asarray(c)) for c in centers
    ), "fixture no longer yields an all-zero centroid"
    rows = all_queries()["doc_kmeans_assign_census"](spark, sf).collect()
    assert sum(r.n_docs for r in rows) == 20
    zero = [r for r in rows if r.n_terms == 0]
    assert zero and all(r.dist_sum_6dp == 0.0 for r in zero)
    assert sum(r.n_docs for r in zero) == 6
