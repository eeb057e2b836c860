"""BM25 search tests (operators/search.py): hand-computable oracle on a
tiny corpus, an independent pure-Python BM25 twin on the real testdata,
NULL/empty contracts, index reuse, and physical-plan pins."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import search

SF001 = "/root/testdata/sf0.01"


def _py_bm25(rows, query, k1=1.2, b=0.75):
    """Independent BM25 twin: plain dict/loop implementation, micro
    quantization applied the same way the operator documents."""
    toks = {
        i: [w for w in re.sub(r"[^a-zA-Z0-9 ]", " ", t).lower().split()]
        if t is not None
        else []
        for i, t in rows
    }
    terms = list(dict.fromkeys(re.sub(r"[^a-zA-Z0-9 ]", " ", query).lower().split()))
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        score, hits = 0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
            tfn = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl))
            score += int(round(idf * tfn * 1e6))
        if hits:
            out[i] = (hits, score)
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_case(spark):
    rows = [
        (1, "cat dog cat"),
        (2, "dog bird"),
        (3, "fish"),
        (4, None),
    ]
    got = {
        r["doc_id"]: (r["n_terms"], r["score_micro"])
        for r in search.bm25_topk(_docs(spark, rows), "cat dog", k=10).collect()
    }
    assert got == _py_bm25(rows, "cat dog")


def test_bm25_matches_python_twin_on_testdata(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    expect = _py_bm25(rows, "fast spark query join")
    top = sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = search.bm25_topk(docs, "fast spark query join", k=20).collect()
    assert [(r["doc_id"], (r["n_terms"], r["score_micro"])) for r in got] == top


def test_bm25_query_dedup_and_empty(spark):
    rows = [(1, "cat dog"), (2, "dog")]
    once = search.bm25_topk(_docs(spark, rows), "dog", k=5).collect()
    twice = search.bm25_topk(_docs(spark, rows), "dog dog DOG", k=5).collect()
    assert [r.asDict() for r in once] == [r.asDict() for r in twice]
    with pytest.raises(ValueError):
        search.bm25_topk(_docs(spark, rows), "?!. ")


def test_bm25_rarer_term_scores_higher(spark):
    # same tf/dl: the rarer term must contribute the larger score
    rows = [(i, "common word") for i in range(9)] + [(9, "rare word")]
    got = {
        r["doc_id"]: r["score_micro"]
        for r in search.bm25_topk(_docs(spark, rows), "common rare", k=10).collect()
    }
    assert got[9] > got[0]


def test_bm25_postings_reuse(spark):
    rows = [(1, "cat dog"), (2, "dog bird"), (3, "cat cat")]
    docs = _docs(spark, rows)
    idx = search.term_postings(docs).localCheckpoint()
    a = search.bm25_topk(docs, "cat", k=5).collect()
    b = search.bm25_topk(docs, "cat", k=5, postings=idx).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_bm25_plan_no_python_no_cartesian_broadcast(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    plan = (
        search.bm25_topk(docs, "fast spark query join", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # query terms + df table ride in as broadcast hash joins; the 1-row
    # stats cross join is a broadcast nested loop (bounded: one row)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
