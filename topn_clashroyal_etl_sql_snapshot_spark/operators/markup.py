"""HTML/markup → text extraction: the FIRST real stage of a web-crawl
corpus funnel (before cleaning, quality, dedup — which all assume plain
text).

No reference analog (training-pipeline extension mandate). Two paths,
same trade as ``operators/compression.py``:

- :func:`strip_tags_fast` — pure codegen ``regexp_replace`` chain for
  machine-generated, simple markup: drops comments and
  ``<script>``/``<style>`` blocks, strips every remaining tag, decodes
  the six ubiquitous entities, collapses whitespace to single spaces.
  Zero Python, rides the scan. NOT entity-complete and regex-based —
  adversarial nesting can leak fragments; use it when the HTML source
  is trusted/templated (e.g. your own render pipeline).
- :func:`extract_html_text` — the robust path: stdlib
  ``html.parser.HTMLParser`` in an Arrow-batched ``mapInPandas`` stage
  (the same bounded per-row-CPU shape as ``decompress_text``).
  Tolerant of malformed markup by construction (the parser never
  raises on bad nesting; anything that still escapes → NULL row, never
  a task failure). Handles ALL character/entity references
  (``convert_charrefs``), skips ``script``/``style``/``template``/
  ``noscript`` and ``head`` content, and emits block-structured text:
  one line per block element, within-line whitespace collapsed —
  paragraph structure survives into the training corpus. ``<title>``
  is captured as its own column (the one head field corpora keep).

Scale: both paths are per-row, shuffle-free, and O(len(html)) with the
input truncated at ``max_bytes`` — a pathological page costs bounded
CPU and memory, never an executor.
"""

from __future__ import annotations

import html.parser
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Elements whose text content is NOT document text.
_SKIP_CONTENT = {"script", "style", "template", "noscript"}

# Block-level elements: entering/leaving one starts a new output line.
# Inline elements (b, i, em, a, span, code, …) do NOT break the line —
# "<b>bo</b>ld" must stay "bold"-adjacent ("bo" and "ld" in one line).
_BLOCK = {
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "td", "th",
    "tr", "ul", "body", "html",
}


class _TextExtractor(html.parser.HTMLParser):
    """Collects document text + title. ``convert_charrefs=True`` (the
    default) decodes every numeric/named reference before handle_data
    sees it."""

    def __init__(self) -> None:
        super().__init__()
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT:
            # max(): tolerate stray </script> without a matching open
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "title":
            self._in_title = False
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
        elif not self._skip_depth:
            self.parts.append(data)


def _normalize(parts: list[str]) -> str:
    """One line per block: split on newlines, collapse within-line
    whitespace, drop empty lines."""
    lines = "".join(parts).split("\n")
    return "\n".join(" ".join(ln.split()) for ln in lines if ln.split())


def extract_one(page: str | None, max_bytes: int = 4_194_304) -> tuple[str | None, str | None]:
    """(text, title) for one HTML document; (None, None) on None input
    or the (theoretical) parser failure. Input truncated at
    ``max_bytes`` characters — bounded CPU per row."""
    if page is None:
        return None, None
    try:
        p = _TextExtractor()
        p.feed(page[:max_bytes])
        p.close()
        title = " ".join("".join(p.title_parts).split())
        return _normalize(p.parts), title or None
    except Exception:
        return None, None


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    title_col: str = "title",
    max_bytes: int = 4_194_304,
) -> DataFrame:
    """Adds ``text_col`` (block-structured extracted text) and
    ``title_col`` from ``html_col``. Existing columns with those names
    are replaced (extract-into-``text`` is the natural call shape —
    same convention as ``decompress_text``). ``mapInPandas``,
    Arrow-batched, embarrassingly parallel, no shuffle."""
    kept = [f for f in df.schema if f.name not in (text_col, title_col)]
    schema = T.StructType(
        kept
        + [
            T.StructField(text_col, T.StringType(), True),
            T.StructField(title_col, T.StringType(), True),
        ]
    )
    kept_names = [f.name for f in kept]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [extract_one(h, max_bytes) for h in pdf[html_col]]
            out = pdf[kept_names].copy()
            out[text_col] = [t for t, _ in pairs]
            out[title_col] = [ti for _, ti in pairs]
            yield out

    return df.mapInPandas(run, schema)


def strip_tags_fast(col: Column) -> Column:
    """Codegen fast path for SIMPLE/templated markup: comments and
    script/style blocks removed, tags stripped to spaces, the six
    ubiquitous entities decoded, whitespace collapsed to single spaces.
    Single-line output (no block structure — use
    :func:`extract_html_text` when paragraph breaks matter). Entire
    chain is JVM-side ``regexp_replace``/``replace`` — zero Python."""
    c = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; LAST
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
