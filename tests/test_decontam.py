"""Decontamination tests (operators/decontam.py): n-gram overlap flags
vs a pure-Python oracle, removal semantics, the broadcast plan shape,
and edge cases (short docs, empty benchmark)."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import decontam


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split() if t]


def _ngrams(text: str, n: int) -> set[str]:
    toks = _tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


@pytest.fixture(scope="module")
def corpus_and_bench(spark):
    import random

    rng = random.Random(31)
    corpus = []
    for i in range(40):
        corpus.append((i, " ".join(rng.choice(WORDS) for _ in range(30))))
    # benchmark: 3 held-out prompts, unrelated vocabulary
    bench = [
        (1000, "the quick brown fox jumps over the lazy dog every single day"),
        (1001, "to be or not to be that is the question for the ages"),
        (1002, "all your base are belong to us said the ancient machine"),
    ]
    # plant contamination: doc 50 quotes benchmark 1000 verbatim inside
    # noise, doc 51 contains benchmark 1001's first 8 words, doc 52 has
    # only a 4-word overlap (below n=5: must stay clean)
    corpus.append((50, "noise words here " + bench[0][1] + " trailing noise"))
    corpus.append((51, " ".join(_tokens(bench[1][1])[:8]) + " unrelated tail words"))
    corpus.append((52, "for the ages indeed " + " ".join(rng.choice(WORDS) for _ in range(20))))
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    return cdf, bdf, corpus, bench


def _oracle_hits(corpus, bench, n) -> dict[int, int]:
    bench_grams = set()
    for _, t in bench:
        bench_grams |= _ngrams(t, n)
    out = {}
    for i, t in corpus:
        k = len(_ngrams(t, n) & bench_grams)
        if k:
            out[i] = k
    return out


@pytest.mark.parametrize("n", [5, 8])
def test_contamination_hits_match_python_oracle(spark, corpus_and_bench, n):
    cdf, bdf, corpus, bench = corpus_and_bench
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontam.contamination_hits(cdf, bdf, n=n).collect()
    }
    assert got == _oracle_hits(corpus, bench, n)


def test_planted_contamination_flagged_and_below_threshold_clean(
    spark, corpus_and_bench
):
    cdf, bdf, corpus, bench = corpus_and_bench
    flagged = {
        r["doc_id"]
        for r in decontam.contamination_hits(cdf, bdf, n=5).collect()
    }
    assert 50 in flagged  # verbatim quote
    assert 51 in flagged  # 8-word prefix ⊃ a 5-gram
    assert 52 not in flagged  # 4-word overlap < n

    clean = decontam.decontaminate(cdf, bdf, n=5)
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    all_ids = {i for i, _ in corpus}
    assert clean_ids == all_ids - flagged
    assert clean.columns == cdf.columns  # every input column survives


def test_report_row(spark, corpus_and_bench):
    cdf, bdf, corpus, bench = corpus_and_bench
    oracle = _oracle_hits(corpus, bench, 5)
    rep = decontam.decontamination_report(cdf, bdf, n=5).collect()[0]
    assert rep["total_docs"] == len(corpus)
    assert rep["contaminated_docs"] == len(oracle)
    assert rep["clean_docs"] == len(corpus) - len(oracle)
    assert rep["total_hits"] == sum(oracle.values())
    assert rep["max_hits"] == max(oracle.values())


def test_empty_benchmark_flags_nothing(spark, corpus_and_bench):
    cdf, _, corpus, _ = corpus_and_bench
    empty = cdf.filter(F.lit(False)).select("doc_id", "text")
    assert decontam.contamination_hits(cdf, empty, n=5).count() == 0
    assert decontam.decontaminate(cdf, empty, n=5).count() == len(corpus)
    rep = decontam.decontamination_report(cdf, empty, n=5).collect()[0]
    assert rep["contaminated_docs"] == 0 and rep["total_hits"] == 0


def test_short_docs_produce_no_ngrams(spark):
    cdf = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    bdf = spark.createDataFrame(
        [(9, "a b c d e f g h i j")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontam.contamination_hits(cdf, bdf, n=5).collect()
    }
    assert got == {2: 6}  # 10 tokens → 6 distinct 5-grams, all shared


def _py_spans(text: str, bench_grams: set[str], n: int) -> list[tuple[int, int, int]]:
    toks = _tokens(text)
    hits = [
        i
        for i in range(len(toks) - n + 1)
        if " ".join(toks[i : i + n]) in bench_grams
    ]
    spans = []
    for p in hits:
        if spans and p <= spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], p + n), spans[-1][2] + 1)
        else:
            spans.append((p, p + n, 1))
    return spans


def test_contamination_spans_match_python_oracle(spark, corpus_and_bench):
    """Merged token-position intervals must equal the Python interval-
    merge twin: one island per maximal run of overlapping matches."""
    cdf, bdf, corpus, bench = corpus_and_bench
    n = 5
    bench_grams = set()
    for _, t in bench:
        bench_grams |= _ngrams(t, n)
    got: dict[int, list] = {}
    for r in decontam.contamination_spans(cdf, bdf, n=n).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_grams_in_span"])
        )
    want = {}
    for i, t in corpus:
        spans = _py_spans(t, bench_grams, n)
        if spans:
            want[i] = spans
    assert {k: sorted(v) for k, v in got.items()} == want
    # doc 50 quotes one contiguous benchmark sentence: exactly one span
    assert len(want[50]) == 1
    start, end, k = want[50][0]
    # the span covers the full quoted region: 12 bench tokens → 8
    # matched 5-grams, span length 12 tokens
    assert k == 8 and end - start == 12


def test_disjoint_quotes_produce_separate_spans(spark):
    bench = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "vv ww xx yy zz")],
        "doc_id long, text string",
    )
    doc_text = (
        "aa bb cc dd ee noise1 noise2 noise3 noise4 vv ww xx yy zz tail"
    )
    docs = spark.createDataFrame([(7, doc_text)], "doc_id long, text string")
    rows = sorted(
        (r["span_start"], r["span_end"])
        for r in decontam.contamination_spans(docs, bench, n=5).collect()
    )
    assert rows == [(0, 5), (9, 14)]


def test_excise_contaminated_matches_python(spark, corpus_and_bench):
    """Excision must drop exactly the tokens inside merged spans and
    keep everything else in order; uncontaminated documents pass
    through as their token join."""
    cdf, bdf, corpus, bench = corpus_and_bench
    n = 5
    bench_grams = set()
    for _, t in bench:
        bench_grams |= _ngrams(t, n)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in decontam.excise_contaminated(cdf, bdf, n=n).collect()
    }
    assert set(got) == {i for i, _ in corpus}
    for i, t in corpus:
        toks = _tokens(t)
        covered = set()
        for s, e, _ in _py_spans(t, bench_grams, n):
            covered.update(range(s, e))
        kept = [tok for p, tok in enumerate(toks) if p not in covered]
        assert got[i] == (
            " ".join(kept),
            len(kept),
            len(toks) - len(kept),
        ), i
    # doc 50 lost its quoted sentence but kept the noise around it
    assert got[50][2] == 12
    assert "quick brown fox" not in got[50][0]
    assert got[50][0].startswith("noise words here")
    # clean docs: nothing dropped
    assert got[3][2] == 0


def test_benchmark_side_is_broadcast(spark, corpus_and_bench):
    """The scale contract: the corpus-side overlap join must be a
    broadcast hash join (benchmark n-gram set ships to executors), not a
    shuffled sort-merge join of corpus postings."""
    cdf, bdf, _, _ = corpus_and_bench
    plan = (
        decontam.contamination_hits(cdf, bdf, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_excise_keeps_null_and_empty_docs(spark, corpus_and_bench):
    """Every corpus document gets an output row (r6 ADVICE finding):
    NULL text keeps a NULL clean_text, zero-token text an empty one,
    both with zero kept/dropped counts — excise_contaminated must not
    silently drop what decontaminate passes through."""
    _, bdf, _, _ = corpus_and_bench
    docs = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   ...   "),  # normalizes to zero tokens
            (4, "plain clean words with no benchmark overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in decontam.excise_contaminated(docs, bdf, n=5).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (None, 0, 0)
    assert got[2] == ("", 0, 0)
    assert got[3] == ("", 0, 0)
    assert got[4][1] > 0 and got[4][2] == 0


def test_split_leakage_report(spark):
    """Cross-split leakage audit: planted near-duplicate content across
    train/val is detected, clean eval docs are not, fractions and
    n-gram totals match a Python recomputation, and the shared-toks
    path equals the fresh-tokenize path."""
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron"
    rows = [
        (1, leak + " train tail words here", "train"),
        (2, "completely different training text about spark windows "
            "and aggregate pushdown plans for the engine", "train"),
        (3, leak + " val copy with its own suffix", "val"),      # leaks
        (4, "pristine validation document with unique words "
            "nowhere else repeated in any split at all", "val"),  # clean
        (5, leak + " test flavored duplicate content", "test"),   # leaks
        (6, "another clean test doc totally disjoint vocabulary "
            "guaranteed unique tokens forever", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    rep = {
        r["split"]: (r["eval_docs"], r["leaked_docs"], r["leaked_frac"],
                     r["total_shared_ngrams"])
        for r in decontam.split_leakage_report(df, n=13).collect()
    }
    assert set(rep) == {"val", "test"}
    assert rep["val"][0] == 2 and rep["val"][1] == 1
    assert rep["val"][2] == 0.5
    assert rep["test"][0] == 2 and rep["test"][1] == 1
    # shared 13-grams: the leak prefix is 15 tokens; doc 3 shares its
    # 13-grams drawn from the common 15-token run with doc 1 → 3 shared
    # positions in the eval doc (15 - 13 + 1)
    assert rep["val"][3] == 3

    from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup

    toks = dedup.token_arrays(df)
    rep2 = {
        r["split"]: (r["eval_docs"], r["leaked_docs"], r["leaked_frac"],
                     r["total_shared_ngrams"])
        for r in decontam.split_leakage_report(df, n=13, toks=toks).collect()
    }
    assert rep2 == rep

    import pytest as _p

    with _p.raises(ValueError):
        decontam.split_leakage_report(df.filter(F.col("split") == "train"))


# ---------------------------------------------------------------------------
# Semantic (embedding-level) decontamination
# ---------------------------------------------------------------------------

def _sem_fixture(spark):
    """Corpus embeddings: ids 0-2 near bench item 100, ids 3-5 far,
    id 6 NULL embedding, id 7 zero vector; bench 100/101 (101 a
    duplicate of 100 with a larger id — the tie-break probe), 102
    orthogonal-ish, 103 NULL (dropped)."""
    corpus = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.95, 0.2, 0.1, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.9, 0.4]),
        (5, [-1.0, 0.0, 0.0, 0.0]),
        (6, None),
        (7, [0.0, 0.0, 0.0, 0.0]),
    ]
    bench = [
        (100, [1.0, 0.0, 0.0, 0.0]),
        (101, [1.0, 0.0, 0.0, 0.0]),
        (102, [0.0, 1.0, 0.0, 0.0]),
        (103, None),
    ]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(bench, "vec_id long, embedding array<double>")
    return corpus, bench, cdf, bdf


def test_semantic_scores_match_numpy_and_duckdb(spark):
    """Per-corpus-row best-cosine-vs-benchmark equals a numpy
    re-derivation AND an independent DuckDB twin at 9 dp; cosine ties
    resolve to the SMALLEST benchmark id; NULL/zero-norm corpus rows
    score NULL rather than silently passing as clean."""
    corpus, bench, cdf, bdf = _sem_fixture(spark)
    out = decontam.semantic_contamination_scores(cdf, bdf)
    got = {
        r["vec_id"]: (r["nearest_bench_id"], r["max_cosine"])
        for r in out.collect()
    }
    assert set(got) == {r[0] for r in corpus}
    assert got[6] == (None, None) and got[7] == (None, None)

    # numpy twin over the non-degenerate rows
    import numpy as np

    for cid, v in corpus:
        if v is None or not any(v):
            continue
        best = max(
            (
                round(
                    float(
                        np.dot(v, bv)
                        / (np.linalg.norm(v) * np.linalg.norm(bv))
                    ),
                    9,
                ),
                -bid,
            )
            for bid, bv in bench
            if bv is not None
        )
        assert abs(got[cid][1] - best[0]) < 2e-9, (cid, got[cid], best)
        assert got[cid][0] == -best[1], (cid, got[cid], best)
    # the tie probe: bench 100 and 101 are identical vectors — the
    # reported nearest id must be the smaller
    assert got[0][0] == 100

    # independent DuckDB twin (same fixed-order fold + rounding)
    import duckdb

    cvals = ", ".join(
        f"({i}, {list(v)})" for i, v in corpus if v is not None and any(v)
    )
    bvals = ", ".join(
        f"({i}, {list(v)})" for i, v in bench if v is not None
    )
    duck = {
        r[0]: (r[1], round(r[2], 9))
        for r in duckdb.connect().execute(f"""
            WITH c(id, v) AS (VALUES {cvals}),
                 b(id, v) AS (VALUES {bvals}),
            s AS (
              SELECT c.id AS cid, b.id AS bid,
                     round(
                       list_sum(list_transform(generate_series(1, 4),
                           t -> c.v[t] * b.v[t]))
                       / (sqrt(list_sum(list_transform(c.v, x -> x*x)))
                          * sqrt(list_sum(list_transform(b.v, x -> x*x)))),
                       9) AS cos
              FROM c, b
            )
            SELECT cid, bid, cos FROM s
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY cid ORDER BY cos DESC, bid ASC) = 1
        """).fetchall()
    }
    for cid, (nb, mc) in duck.items():
        assert got[cid][0] == nb and abs(got[cid][1] - mc) < 2e-9, (
            cid, got[cid], (nb, mc),
        )


def test_semantic_decontaminate_and_plan(spark):
    """Documents whose embedding sits at >= threshold cosine to any
    benchmark embedding are dropped; docs with no embedding row or a
    NULL embedding are KEPT (absence of an embedding is not evidence
    of cleanliness — documented contract); the benchmark side is
    broadcast (no CartesianProduct, no Python nodes) and the fuse
    refuses an over-sized broadcast."""
    _, _, cdf, bdf = _sem_fixture(spark)
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(9)],  # 8 has no embedding row
        "doc_id long, text string",
    )
    clean = decontam.semantic_decontaminate(docs, cdf, bdf, threshold=0.95)
    kept = sorted(r["doc_id"] for r in clean.collect())
    # 0 (cos 1.0), 1 (cos ~0.995) flagged; 2 is at cos ~0.974 -> also
    # flagged at 0.95; far/NULL/missing rows survive
    assert kept == [3, 4, 5, 6, 7, 8]

    scores = decontam.semantic_contamination_scores(cdf, bdf)
    plan = scores._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    with pytest.raises(ValueError, match="max_benchmark_rows"):
        decontam.semantic_contamination_scores(
            cdf, bdf, max_benchmark_rows=2
        )


def test_semantic_score_expr_bit_parity_with_batch(spark):
    """The stateless expression twin reproduces the batch scorer
    EXACTLY — same nearest ids, bit-equal rounded cosines — across
    near/far/negative/NULL/zero-vector corpus rows and the duplicate-
    benchmark tie probe; the empty-benchmark guard scores NULL; the
    collector fuse raises past max_benchmark_rows."""
    _, _, cdf, bdf = _sem_fixture(spark)
    bench = decontam.collect_benchmark_embeddings(bdf)
    assert [b[0] for b in bench] == [100, 101, 102]  # NULL bench dropped

    got = {
        r["vec_id"]: (r["s"]["nearest_bench_id"], r["s"]["max_cosine"])
        for r in cdf.select(
            "vec_id",
            decontam.semantic_score_expr(F.col("embedding"), bench).alias("s"),
        ).collect()
    }
    want = {
        r["vec_id"]: (r["nearest_bench_id"], r["max_cosine"])
        for r in decontam.semantic_contamination_scores(cdf, bdf).collect()
    }
    assert got == want  # bit-equal, not approx

    empty = cdf.select(
        decontam.semantic_score_expr(F.col("embedding"), []).alias("s")
    ).collect()
    assert all(r["s"]["max_cosine"] is None for r in empty)

    with pytest.raises(ValueError, match="max_benchmark_rows"):
        decontam.collect_benchmark_embeddings(bdf, max_benchmark_rows=2)


def test_semantic_score_expr_streams(spark, tmp_path):
    """The claim the expression twin exists for: a Structured
    Streaming ingest evaluates the semantic gate per row with NO
    aggregation, watermark, or state — availableNow over a jsonl
    landing dir, memory sink, output equal to the batch scorer's."""
    import json as _json

    corpus, _, cdf, bdf = _sem_fixture(spark)
    land = tmp_path / "emb_land"
    land.mkdir()
    with open(land / "e0.jsonl", "w") as f:
        for cid, v in corpus:
            f.write(_json.dumps({"vec_id": cid, "embedding": v}) + "\n")

    bench = decontam.collect_benchmark_embeddings(bdf)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(str(land))
        .select(
            "vec_id",
            decontam.semantic_score_expr(F.col("embedding"), bench).alias("s"),
        )
        .select("vec_id", "s.nearest_bench_id", "s.max_cosine")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sem_gate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["vec_id"]: (r["nearest_bench_id"], r["max_cosine"])
        for r in spark.sql("SELECT * FROM sem_gate_out").collect()
    }
    want = {
        r["vec_id"]: (r["nearest_bench_id"], r["max_cosine"])
        for r in decontam.semantic_contamination_scores(cdf, bdf).collect()
    }
    assert got == want


def test_split_leakage_guards_r11(spark):
    """r11 review hardening: a train_label selecting no documents
    raises instead of auditing every split against an empty train side
    (all-clean with zero signal), and the eval-side broadcast has a
    size fuse like semantic_contamination_scores' benchmark bound."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta", "train"),
         (2, "alpha beta gamma delta epsilon zeta eta theta", "val")],
        "doc_id long, text string, split string",
    )
    with pytest.raises(ValueError, match="selects no documents"):
        decontam.split_leakage_report(docs, train_label="training", n=3)
    with pytest.raises(ValueError, match="max_eval_ngrams"):
        decontam.split_leakage_report(docs, n=3, max_eval_ngrams=2)
    out = {r["split"]: r["leaked_docs"]
           for r in decontam.split_leakage_report(docs, n=3).collect()}
    assert out == {"val": 1}  # the planted cross-split dup is caught
