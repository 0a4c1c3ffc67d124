"""Document extraction: JSON envelopes -> HTML body text -> clean rows.

Mirrors the reference's extraction layer:
- JSON envelope registry (sec_document_registry.yml:1-28: bucket objects
  are ``{"content": "<html...>", "metadata": {...}}`` envelopes; the
  registry projects content + metadata and lineage columns).
- HTML -> body text (transforms/sec_envelope_text.py:35-38:
  ``BeautifulSoup(html).get_text(" ", strip=True)``): re-implemented on
  the stdlib ``html.parser`` (bs4 is not installed in this container) —
  script/style subtrees dropped, character references decoded, all
  whitespace collapsed to single spaces.
- PDF page offsets (fomc_document_registry.yml:9-17: ``include_pages``
  emits per-page char offsets into ``text``): same contract here; the
  codec tries pypdf and otherwise falls back to a clearly-marked
  form-feed page splitter (this container ships no PDF lib), so the
  offset plumbing is real and tested even where the codec is stubbed.

Spark-first split of the work:
- Envelope field projection is NATIVE JSON (``get_json_object``) — JVM
  side, codegen'd, no Python.
- Only the HTML parse itself crosses into Python, as an Arrow-batched
  pandas UDF (the documented slow path done right); payload bytes never
  shuffle — the parse is map-only.
"""

from __future__ import annotations

import html as _html
import json
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..registry import query

_SKIP_TAGS = {"script", "style", "head", "template"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.fragments: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip and data:
            self.fragments.append(data)


def html_to_text(html_str: str | None) -> str | None:
    """Body text of an HTML document: script/style dropped, charrefs
    decoded, whitespace collapsed (the get_text(" ", strip=True) contract
    of transforms/sec_envelope_text.py:35-38)."""
    if not html_str:
        return None
    p = _TextExtractor()
    p.feed(html_str)
    p.close()
    # fragments join with " " (tag boundaries are word boundaries — the
    # get_text(" ") contract), then all runs of whitespace collapse
    return " ".join(" ".join(p.fragments).split())


def html_to_text_udf():
    """Arrow-batched HTML parse stage (built lazily — pandas_udf needs an
    active session for its DDL return type)."""

    @pandas_udf("string")
    def _udf(html_col: pd.Series) -> pd.Series:
        return html_col.map(html_to_text)

    return _udf


def make_envelope_udf():
    """Test-fixture envelope builder: wraps text into the reference's
    JSON envelope shape with HTML-escaped body content."""

    def wrap(t, s):
        body = (
            "<html><head><title>t</title><style>p{color:red}</style></head>"
            f"<body><p>{_html.escape(t or '')}</p>"
            "<script>var x = 1 < 2;</script></body></html>"
        )
        return json.dumps({"content": body, "metadata": {"source": s}})

    @pandas_udf("string")
    def _udf(text: pd.Series, source: pd.Series) -> pd.Series:
        return pd.Series([wrap(t, s) for t, s in zip(text, source)])

    return _udf


def envelope_registry(envelopes: DataFrame, envelope_col: str) -> DataFrame:
    """JSON-backend registry projection (sec_document_registry.yml): the
    envelope's content/metadata fields lifted with native JSON functions,
    plus content_hash lineage. Pure JVM — no Python in this stage."""
    env = F.col(envelope_col)
    return envelopes.select(
        *[c for c in envelopes.columns if c != envelope_col],
        F.get_json_object(env, "$.content").alias("content"),
        F.get_json_object(env, "$.metadata.source").alias("meta_source"),
        F.md5(F.get_json_object(env, "$.content")).alias("content_hash"),
    )


def document_text(registry: DataFrame, dedup_order=None) -> DataFrame:
    """HTML -> clean body text over the registry, deduped by
    content_hash (sec_document_text.yml: content_hash unique at this
    grain). ``dedup_order`` picks the surviving row deterministically
    (e.g. lowest doc_id); without it an arbitrary duplicate survives."""
    from pyspark.sql.window import Window

    extracted = registry.withColumn(
        "text", html_to_text_udf()(F.col("content"))
    ).drop("content")
    if dedup_order is None:
        deduped = extracted.dropDuplicates(["content_hash"])
    else:
        w = Window.partitionBy("content_hash").orderBy(dedup_order)
        deduped = (
            extracted.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    return deduped.withColumn("n_chars", F.length("text").cast("long"))


# ------------------------------------------------- oracle-checked query
# Round-trip law: wrapping each document's text in an escaped HTML
# envelope and running the registry -> text pipeline must recover the
# whitespace-normalized original. The oracle states the law directly in
# SQL, so the whole envelope/parse path is hash-verified, not just
# smoke-tested.

_ROUNDTRIP_ORACLE = """
WITH norm AS (
  SELECT doc_id, source, text,
         trim(regexp_replace(text, '[ \t\n\r\f\v]+', ' ', 'g'))
           AS extracted_text
  FROM documents
),
deduped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM norm
)
SELECT doc_id, source, extracted_text,
       CAST(length(extracted_text) AS BIGINT) AS n_chars
FROM deduped WHERE rn = 1
ORDER BY doc_id
"""


@query("doc_html_extraction", oracle=_ROUNDTRIP_ORACLE)
def doc_html_extraction(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    env = docs.select(
        "doc_id",
        "source",
        make_envelope_udf()(F.col("text"), F.col("source")).alias(
            "envelope"
        ),
    )
    reg = envelope_registry(env, "envelope")
    txt = document_text(reg, dedup_order=F.col("doc_id"))
    return txt.select(
        "doc_id",
        F.col("meta_source").alias("source"),
        F.col("text").alias("extracted_text"),
        "n_chars",
    ).orderBy("doc_id")


# ------------------------------------------------------------------- PDF


def pdf_available() -> bool:
    try:
        import pypdf  # noqa: F401

        return True
    except ImportError:
        return False


def pdf_text_with_pages(payload: bytes) -> tuple[str, list[dict]]:
    """Per-page text + char offsets (fomc_document_registry.yml
    include_pages contract). Real path uses pypdf; in this container
    (probed: pypdf absent) the fallback splits on form-feed — an honest
    stand-in that keeps the offset arithmetic and downstream
    page-attribution logic fully exercised."""
    if pdf_available():
        import io

        from pypdf import PdfReader

        pages = [
            (p.extract_text() or "") for p in PdfReader(io.BytesIO(payload)).pages
        ]
    else:
        pages = payload.decode("latin-1", errors="replace").split("\x0c")
    offsets, parts, pos = [], [], 0
    for i, ptxt in enumerate(pages):
        offsets.append({"page": i + 1, "char_start": pos})
        parts.append(ptxt)
        pos += len(ptxt) + 1  # +1 for the joining newline
    return "\n".join(parts), offsets
