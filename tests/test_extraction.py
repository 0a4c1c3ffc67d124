"""Document-extraction unit tests: HTML parser parity with the
reference's get_text contract, PDF page-offset arithmetic, and the
binaryFile -> envelope registry -> text end-to-end path."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from economic_data_project_spark.sources.files import read_binary_documents
from economic_data_project_spark.text.extraction import (
    document_text,
    envelope_registry,
    html_to_text,
    pdf_available,
    pdf_text_with_pages,
)


def test_html_to_text_strips_script_style_and_decodes_entities():
    html = (
        "<html><head><title>skip</title><style>p{}</style></head><body>"
        "<h1>Header</h1><p>a &amp; b &lt; c</p>"
        "<script>var ignored = '<p>not text</p>';</script>"
        "<div>  spaced\n\nout  </div><!-- comment --></body></html>"
    )
    assert html_to_text(html) == "Header a & b < c spaced out"


def test_html_to_text_handles_nested_skips_and_empty():
    assert html_to_text("") is None
    assert html_to_text(None) is None
    assert html_to_text("<body><style>x</style>ok</body>") == "ok"
    # unclosed skip tag: remainder suppressed, no crash
    assert html_to_text("<body>start<script>var x=1;") == "start"


def test_pdf_page_offsets_contract():
    payload = "page one text\x0cpage two\x0clast".encode("latin-1")
    text, pages = pdf_text_with_pages(payload)
    assert not pdf_available()  # sandbox probe (README documents this)
    assert [p["page"] for p in pages] == [1, 2, 3]
    starts = [p["char_start"] for p in pages]
    assert starts[0] == 0
    # every offset points at the start of its page's text
    assert text[starts[1] : starts[1] + 8] == "page two"
    assert text[starts[2] :] == "last"


def test_binaryfile_envelope_registry_end_to_end(spark, tmp_path):
    for i, body in enumerate(["<p>alpha &amp; beta</p>", "<p>gamma</p>"]):
        env = {"content": body, "metadata": {"source": f"s{i}"}}
        (tmp_path / f"doc{i}.json").write_text(json.dumps(env))
    raw = read_binary_documents(spark, str(tmp_path), "*.json")
    envelopes = raw.select(
        "object_name", F.decode("content", "utf-8").alias("envelope")
    )
    reg = envelope_registry(envelopes, "envelope")
    out = {
        r.object_name: (r.text, r.meta_source)
        for r in document_text(reg).collect()
    }
    assert out["doc0.json"] == ("alpha & beta", "s0")
    assert out["doc1.json"] == ("gamma", "s1")
