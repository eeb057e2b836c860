"""Chunking tests (operators/chunking.py): the windowing contract vs
a DuckDB oracle and a Python twin, coverage/overlap invariants,
composition with BPE + packing, and the codegen plan pin."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import bpe, chunking


def _py_chunks(s: str, size: int, overlap: int) -> list[str]:
    step = size - overlap
    n = len(s)
    n_chunks = 1 + max(0, -(-max(n - size, 0) // step))
    return [s[k * step : k * step + size] for k in range(n_chunks)]


@pytest.mark.parametrize("size,overlap", [(10, 0), (10, 3), (7, 6), (100, 10)])
def test_chunk_by_chars_matches_python_and_duckdb(spark, size, overlap):
    texts = [
        (1, "a" * 5),          # shorter than size: one chunk
        (2, "b" * size),       # exactly size: one chunk
        (3, "c" * (size + 1)), # one char over: two chunks
        (4, "the quick brown fox jumps over the lazy dog " * 4),
        (5, ""),               # empty: one empty chunk
        (6, None),             # NULL: no rows
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[tuple, str] = {}
    for r in chunking.chunk_by_chars(df, size, overlap).collect():
        got[(r["doc_id"], r["chunk_idx"])] = r["chunk_text"]
        assert r["chunk_chars"] == len(r["chunk_text"])
    want = {
        (i, k): c
        for i, t in texts
        if t is not None
        for k, c in enumerate(_py_chunks(t, size, overlap))
    }
    assert got == want

    # DuckDB oracle: identical windowing in SQL
    step = size - overlap
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", texts)
    orows = con.execute(f"""
        SELECT doc_id, k AS chunk_idx,
               substring(text, k * {step} + 1, {size}) AS chunk_text
        FROM docs, UNNEST(generate_series(0,
            CAST(ceil(greatest(length(text) - {size}, 0) / {step}.0) AS BIGINT)
        )) AS t(k)
        WHERE text IS NOT NULL
    """).fetchall()
    assert {(i, k): c for i, k, c in orows} == want


def test_full_coverage_and_exact_overlap(spark):
    text = "x" * 95
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunking.chunk_by_chars(df, 30, 10).collect(),
        key=lambda r: r["chunk_idx"],
    )
    step = 20
    # chunks cover every position; consecutive chunks share exactly 10
    spans = [(r["chunk_idx"] * step, r["chunk_idx"] * step + r["chunk_chars"]) for r in rows]
    assert spans[0][0] == 0 and spans[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 == e1 - 10  # overlap of exactly 10 chars
    assert all(r["chunk_chars"] <= 30 for r in rows)


def test_chunk_by_tokens_composes_with_bpe_and_packing(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat " * 10, "a"),
         (2, "short doc", "a"),
         (3, None, "a")],
        "doc_id long, text string, source string",
    )
    merges = bpe.train_bpe_sampled(docs, n_merges=20)
    enc = bpe.bpe_encode_text(docs, merges)
    chunks = chunking.chunk_by_tokens(enc, size=16, overlap=4)
    rows = chunks.collect()
    # NULL text produced no chunk rows
    assert {r["doc_id"] for r in rows} == {1, 2}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    full = {r["doc_id"]: r["token_ids"] for r in enc.collect() if r["token_ids"] is not None}
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        ids = full[doc_id]
        # chunk k reproduces the python slice of the full id list
        for r in rs:
            s = r["chunk_idx"] * 12
            assert r["chunk_ids"] == ids[s : s + 16]
            assert r["n_tokens"] == len(r["chunk_ids"])
        # stitching chunks (dropping the 4-token overlap) rebuilds the doc
        stitched = list(rs[0]["chunk_ids"])
        for r in rs[1:]:
            stitched += r["chunk_ids"][4:]
        assert stitched == ids

    # chunks flow into the packer on real token counts
    from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import pack_greedy

    packed = pack_greedy(
        chunks, ["source"], [F.asc("doc_id"), F.asc("chunk_idx")], "n_tokens", budget=32
    )
    assert packed.count() == len(rows)


def test_chunking_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunking.chunk_by_chars(df, 10, 10)
    with pytest.raises(ValueError, match="overlap"):
        chunking.chunk_by_tokens(df, 5, -1)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunking.chunk_by_chars(df, 10, 2).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # narrow generator, no shuffle


def test_chunk_by_sentences_matches_python_twin(spark):
    """Sentence-boundary chunking vs a Python twin implementing the
    same floor-of-running-sum grouping: reconstruction (joined chunks
    ≡ joined sentences), pack_greedy-style budget semantics (overflow
    by < one sentence), over-budget single sentences alone, NULL/empty
    docs absent."""
    import re as _re

    from topn_clashroyal_etl_sql_snapshot_spark.operators.chunking import (
        chunk_by_sentences,
    )

    docs = [
        (1, "Short one. Another short. A third sentence here! Done? Yes."),
        (2, "One enormous sentence that just keeps going and going and "
            "going without any boundary at all"),
        (3, "Tiny. " * 40),
        (4, None),
        (5, ""),
        (6, "Mixed! " + "x" * 120 + ". Short tail."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    max_chars = 50
    got: dict[int, list] = {}
    for r in chunk_by_sentences(df, max_chars).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["chunk_chars"], r["n_sentences"])
        )
    for v in got.values():
        v.sort()

    def py_chunks(text):
        if not text:
            return []
        sents = [s.strip() for s in _re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        bins: dict[int, list] = {}
        cum = 0
        for s in sents:
            bins.setdefault(cum // max_chars, []).append(s)
            cum += len(s) + 1
        out = []
        for i, b in enumerate(sorted(bins)):
            txt = " ".join(bins[b])
            out.append((i, txt, len(txt), len(bins[b])))
        return out

    for doc_id, text in docs:
        expect = py_chunks(text)
        assert got.get(doc_id, []) == expect, doc_id
    # structure assertions on the twin-verified output
    assert 4 not in got and 5 not in got
    assert len(got[2]) == 1 and got[2][0][2] > max_chars  # over-budget alone
    # reconstruction: chunks rejoin to the sentence stream
    joined = " ".join(c[1] for c in got[3])
    assert joined == " ".join(s.strip() for s in docs[2][1].split() if s)
    # budget: every chunk ≤ max + longest sentence it contains
    for doc_id, chunks in got.items():
        for _, txt, chars, _n in chunks:
            longest = max(len(s) for s in _re.split(r"(?<=[.!?])\s+", txt))
            assert chars <= max_chars + longest


def test_chunk_by_sentences_plan_and_validation(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.chunking import (
        chunk_by_sentences,
    )

    df = spark.createDataFrame([(1, "A b. C d.")], "doc_id long, text string")
    plan = (
        chunk_by_sentences(df, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    import pytest as _p

    with _p.raises(ValueError):
        chunk_by_sentences(df, 0)
