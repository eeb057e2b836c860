"""HTML extraction tests (operators/markup.py): fixture pages with
hand-written expected text, entity/charref decoding, malformed input
tolerance, fuzzing, the mapInPandas operator shape, and the codegen
contract of the fast path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import markup


PAGE = """<!DOCTYPE html>
<html><head>
  <title>  The   Page&nbsp;Title </title>
  <style>body { color: red; }</style>
  <script>var x = "<p>not text</p>";</script>
</head>
<body>
  <h1>Heading &amp; more</h1>
  <p>First <b>bo</b>ld paragraph with a <a href="#">link</a>.</p>
  <p>Second&#32;paragraph &lt;escaped&gt; &#x2014; done.</p>
  <!-- a comment with <p>fake tags</p> -->
  <div>block<br>break</div>
  <ul><li>one</li><li>two</li></ul>
</body></html>"""

PAGE_TEXT = (
    "Heading & more\n"
    "First bold paragraph with a link.\n"
    "Second paragraph <escaped> — done.\n"
    "block\nbreak\n"
    "one\ntwo"
)


def test_fixture_page_extraction():
    text, title = markup.extract_one(PAGE)
    assert text == PAGE_TEXT
    assert title == "The Page Title"


def test_inline_tags_do_not_split_words_but_blocks_do():
    text, _ = markup.extract_one("<p>a<b>b</b>c</p><p>next</p>")
    assert text == "abc\nnext"
    text, _ = markup.extract_one("<div>x</div><div>y</div>")
    assert text == "x\ny"


def test_malformed_never_crashes_and_stays_sane():
    cases = [
        "",  # empty
        "no markup at all",
        "<p>unclosed paragraph",
        "</p>stray close<b>unclosed bold",
        "<p <div>> broken attrs</p>",
        "< not a tag at all",
        "<script>never closed...",
        "</script>stray script close<p>text</p>",
        "&#xZZ; &unknown; &amp",  # broken references
        "<p>" * 5000 + "deep" + "</p>" * 5000,
    ]
    for page in cases:
        text, title = markup.extract_one(page)
        assert text is not None, page[:40]
    # stray </script> must not swallow following text
    text, _ = markup.extract_one("</script>stray<p>kept</p>")
    assert "kept" in text
    # unclosed <script> swallows its (script) tail — by design
    text, _ = markup.extract_one("<p>seen</p><script>var x=1;")
    assert text == "seen"
    assert markup.extract_one(None) == (None, None)


def test_fuzzed_bytes_never_raise():
    import random

    rng = random.Random(17)
    alphabet = "<>/ab&#;x \"=!-"
    for _ in range(200):
        page = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 300)))
        markup.extract_one(page)  # must not raise


def test_max_bytes_truncates_pathological_input():
    page = "<p>" + "word " * 100 + "</p>"
    full, _ = markup.extract_one(page)
    truncated, _ = markup.extract_one(page, max_bytes=50)
    assert len(truncated) < len(full)


def test_operator_over_dataframe(spark):
    rows = [
        (1, PAGE),
        (2, "<p>tiny</p>"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in markup.extract_html_text(df).collect()}
    assert got[1]["text"] == PAGE_TEXT and got[1]["title"] == "The Page Title"
    assert got[2]["text"] == "tiny" and got[2]["title"] is None
    assert got[3]["text"] is None and got[3]["title"] is None
    # replaces an existing text column rather than duplicating it
    df2 = df.withColumn("text", F.lit("old"))
    out_cols = markup.extract_html_text(df2).columns
    assert out_cols.count("text") == 1


def test_fast_path_matches_parser_on_simple_pages(spark):
    """On templated markup (no exotic entities, well-formed tags) the
    codegen fast path must agree with the parser path modulo line
    structure (fast path is single-line by contract)."""
    pages = [
        "<p>hello world</p>",
        "<div>a &amp; b</div><div>c &lt;d&gt;</div>",
        "<h1>t</h1><script>drop()</script><p>keep</p>",
        "<!-- c --><p>x&nbsp;y</p>",
        "plain text",
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], "i long, html string")
    fast = {
        r["i"]: r["t"]
        for r in df.select("i", markup.strip_tags_fast(F.col("html")).alias("t")).collect()
    }
    for i, page in enumerate(pages):
        text, _ = markup.extract_one(page)
        assert fast[i] == " ".join(text.split()), page


def test_fast_path_is_codegen(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(1, "<p>x</p>")], "i long, html string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(markup.strip_tags_fast(F.col("html"))).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
