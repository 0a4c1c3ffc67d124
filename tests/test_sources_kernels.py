"""File-source tests + value assertions for the rows-only matrix kernels
(the driver only row-counts those; real invariants live here)."""

from __future__ import annotations

import pytest

from economic_data_project_spark.registry import all_queries
from economic_data_project_spark.sources.files import (
    read_binary_documents,
    read_jsonl_documents,
    read_seed,
    split_quarantine,
)

from .conftest import SF_DIR


def test_binary_document_source(spark, tmp_path):
    (tmp_path / "a.htm").write_bytes(b"<html>alpha</html>")
    (tmp_path / "b.htm").write_bytes(b"<html>beta</html>")
    (tmp_path / "skip.txt").write_bytes(b"nope")
    docs = read_binary_documents(spark, str(tmp_path), "*.htm")
    rows = {r.object_name: r for r in docs.collect()}
    assert set(rows) == {"a.htm", "b.htm"}
    assert rows["a.htm"].n_bytes == 18
    assert bytes(rows["a.htm"].content) == b"<html>alpha</html>"
    assert len(rows["a.htm"].content_hash) == 32


def test_jsonl_corpus_source(spark, tmp_path):
    """Roundtrip: the parquet documents table written as gzipped jsonl
    shards (plus one malformed line) reads back row-identical on the
    clean side, with the bad line quarantined verbatim."""
    import gzip
    import json

    import pandas as pd

    src = pd.read_parquet(f"{SF_DIR}/documents.parquet").head(50)
    recs = src.to_dict("records")
    half = len(recs) // 2
    (tmp_path / "shard-0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs[:half]) + "\n"
    )
    with gzip.open(tmp_path / "shard-1.jsonl.gz", "wt") as fh:
        fh.write("\n".join(json.dumps(r) for r in recs[half:]) + "\n")
        fh.write('{"doc_id": 999, "text": BROKEN\n')
        # PARTIALLY corrupt: valid JSON, one ill-typed field. Must land
        # in quarantine, not vanish — detection depends on which columns
        # the scan parses, which is why split_quarantine caches.
        fh.write(
            '{"doc_id": 998, "text": "x", "lang": "en",'
            ' "source": "s", "n_chars": "oops"}\n'
        )

    df = read_jsonl_documents(spark, str(tmp_path))
    clean, bad = split_quarantine(df)
    got = {
        r.doc_id: r.text
        for r in clean.select("doc_id", "text").collect()
    }
    want = {int(r["doc_id"]): r["text"] for r in recs}
    assert got == want
    quarantined = bad.collect()
    assert len(quarantined) == 2
    raws = " | ".join(r.raw_line for r in quarantined)
    assert "BROKEN" in raws and "oops" in raws
    assert set(clean.columns) == {
        "doc_id", "text", "lang", "source", "n_chars",
    }


def test_jsonl_source_guards(spark, tmp_path):
    """Non-default schemas must fail loudly, not silently misbehave: a
    caller-supplied schema already naming _corrupt_record would collide
    with the appended quarantine column, and split_quarantine keys the
    dead-letter half on an EXPLICIT id column, not position 0."""
    (tmp_path / "s.jsonl").write_text('{"item_id": 1, "body": "x"}\n')
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl_documents(
            spark, str(tmp_path), "item_id long, _corrupt_record string"
        )
    df = read_jsonl_documents(
        spark, str(tmp_path), "item_id long, body string"
    )
    with pytest.raises(ValueError, match="doc_id"):
        split_quarantine(df)  # default id col absent -> loud
    clean, bad = split_quarantine(df, id_col="item_id")
    assert clean.collect()[0].item_id == 1
    assert bad.columns == ["item_id", "raw_line"]


def test_jsonl_ingest_repeat_invocation_stable(spark):
    """Same-session re-invocation overwrites the same shard dir; the
    cached relation over that path must see the planted dead-letter
    shard every time. (Without the explicit refreshByPath, the
    overwrite-write's own refresh re-listed the dir BEFORE the planted
    file existed, and the second run's quarantine silently read 0.)"""
    from economic_data_project_spark.sources.files import _N_PLANTED_BAD

    q = all_queries()["jsonl_corpus_ingest"]
    a = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
    assert a == b
    assert ("__quarantine__", _N_PLANTED_BAD, None) in b


def test_csv_seed_loader(spark, tmp_path):
    p = tmp_path / "mapping.csv"
    p.write_text("code,name,weight\nGDP,Gross,1.5\nCPI,Prices,2.0\n")
    seed = read_seed(spark, str(p), "code string, name string, weight double")
    rows = {r.code: r for r in seed.collect()}
    assert rows["GDP"].weight == 1.5 and rows["CPI"].name == "Prices"


@pytest.fixture(scope="module")
def kernels(spark):
    qs = all_queries()
    return {
        n: qs[n](spark, SF_DIR).collect()
        for n in (
            "signal_turbulence",
            "signal_absorption_ratio",
            "signal_mst_network",
        )
    }


def test_turbulence_invariants(kernels):
    rows = kernels["signal_turbulence"]
    assert len(rows) > 10
    assert all(r.turbulence >= 0 for r in rows)
    assert all(0.0 <= r.turb_pct <= 1.0 for r in rows)
    assert {r.regime for r in rows} <= {"normal", "elevated", "extreme"}
    # dates strictly increasing (single sorted series)
    ds = [r.d for r in rows]
    assert ds == sorted(ds)


def test_absorption_ratio_invariants(kernels):
    rows = kernels["signal_absorption_ratio"]
    assert len(rows) > 10
    # AR is a share of total variance: in (0, 1]
    assert all(0.0 < r.absorption_ratio <= 1.0 for r in rows)
    deltas = [r.ar_delta for r in rows[1:]]
    assert any(d != 0 for d in deltas)


def test_mst_invariants(kernels):
    rows = kernels["signal_mst_network"]
    assert len(rows) > 10
    # a spanning tree over n<=25 nodes: positive length, max degree >= 1,
    # leaf share in (0, 1)
    assert all(r.mst_total_length > 0 for r in rows)
    assert all(1 <= r.mst_max_degree <= 24 for r in rows)
    assert all(0.0 < r.leaf_share < 1.0 for r in rows)


def test_csv_roundtrip_rfc4180_hostile(spark, tmp_path):
    """Value-level proof of the CSV corpus interchange contract
    (sources/files.CSV_CORPUS_*_OPTS): embedded newlines, quotes and
    commas inside quoted fields, and the NULL-vs-empty-string
    distinction all survive the round trip exactly. (Known residual
    CSV ambiguity, out of contract: a document whose text is the
    literal null marker itself.)"""
    hostile = [
        (0, "line one\nline two\nline three", "en"),  # embedded newlines
        (1, 'he said "hi, there", twice', "en"),  # quotes + commas
        (2, "", "fr"),  # empty string, not null
        (3, None, "fr"),  # null, not empty string
        (4, "plain", "de"),
        (5, "trailing newline\n", "de"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, "fx", len(t) if t else 0) for i, t, lg in hostile],
        "doc_id long, text string, lang string,"
        " source string, n_chars long",
    )
    from economic_data_project_spark.sources.files import (
        CSV_CORPUS_READ_OPTS,
        CSV_CORPUS_WRITE_OPTS,
    )

    out = str(tmp_path / "csv")
    w = df.coalesce(1).write.mode("overwrite")
    for k, v in CSV_CORPUS_WRITE_OPTS.items():
        w = w.option(k, v)
    w.csv(out)
    r = spark.read.schema(df.schema)
    for k, v in CSV_CORPUS_READ_OPTS.items():
        r = r.option(k, v)
    back = {row.doc_id: row for row in r.csv(out).collect()}
    assert set(back) == {i for i, _, _ in hostile}
    for i, t, lg in hostile:
        assert back[i].text == t, (i, repr(back[i].text), repr(t))
        assert back[i].lang == lg
    # the two failure modes the options exist for, stated explicitly:
    assert back[0].text.count("\n") == 2   # record not split
    assert back[2].text == "" and back[3].text is None  # '' != NULL
