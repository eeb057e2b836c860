"""DSIR importance-resampling tests (operators/dsir.py): exact integer
parity with pure-Python twins for both model kinds, fit determinism,
sign contracts on constructed domains, Gumbel top-k sampling behavior,
the stateless streaming expression twin, and broadcast/no-Python/
TakeOrdered plan pins."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import dsir
from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import spark_xxhash64

TARGET_VOCAB = "theorem proof lemma integral manifold tensor algebra".split()
RAW_VOCAB = "click buy cheap deal offer subscribe winner".split()
SHARED = "the and of data".split()


def _mk(spark, vocab, n, seed, start=0):
    rng = random.Random(seed)
    rows = [
        (start + i, " ".join(rng.choice(vocab + SHARED) for _ in range(15)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(vocab, n, seed):
    rng = random.Random(seed)
    return [" ".join(rng.choice(vocab + SHARED) for _ in range(15)) for _ in range(n)]


def _py_score(model, text):
    """Pure-Python twin of importance_logweights for one document."""
    table, default = model["ratio_micro"], model["default_micro"]
    terms = dsir.py_terms(text, model["bigrams"])
    if model["kind"] == "hashed":
        nb = model["n_buckets"]
        keys = [spark_xxhash64([("string", t)]) % nb for t in terms]
    else:
        keys = terms
    return len(terms), sum(table.get(k, default) for k in keys)


# ---------------------------------------------------------------- fits


def test_term_fit_is_deterministic_and_sparse():
    m1 = dsir.fit_term_importance(_texts(TARGET_VOCAB, 20, 1), _texts(RAW_VOCAB, 20, 2))
    m2 = dsir.fit_term_importance(_texts(TARGET_VOCAB, 20, 1), _texts(RAW_VOCAB, 20, 2))
    assert m1 == m2
    # the both-unseen default is NOT stored per-term
    assert m1["default_micro"] not in (None,)
    assert all(v != m1["default_micro"] for v in m1["ratio_micro"].values())


def test_hashed_fit_matches_python_counts(spark):
    """The Spark fit's ratio table equals _ratio_table over bucket
    counts computed entirely in Python (tokenize + xxhash64 twin) —
    pins the whole fit path, not just the arithmetic."""
    tgt = _mk(spark, TARGET_VOCAB, 12, 5)
    raw = _mk(spark, RAW_VOCAB, 12, 6, start=100)
    nb = 1 << 12
    model = dsir.fit_hashed_importance(tgt, raw, n_buckets=nb, add_k=0.5)

    def py_counts(df):
        c: dict[int, int] = {}
        for r in df.collect():
            for t in dsir.py_terms(r["text"], True):
                b = spark_xxhash64([("string", t)]) % nb
                c[b] = c.get(b, 0) + 1
        return c

    table, default = dsir._ratio_table(py_counts(tgt), py_counts(raw), nb, 0.5)
    assert model["ratio_micro"] == table
    assert model["default_micro"] == default


def test_fit_rejects_bad_params():
    with pytest.raises(ValueError):
        dsir.fit_term_importance(["a"], ["b"], add_k=0.0)
    with pytest.raises(ValueError):
        dsir._ratio_table({}, {}, 0, 0.5)


# ------------------------------------------------------------- scoring


@pytest.mark.parametrize("kind", ["hashed", "term"])
def test_score_matches_python_twin_exactly(spark, kind):
    tgt = _mk(spark, TARGET_VOCAB, 10, 11)
    raw = _mk(spark, RAW_VOCAB, 10, 12, start=100)
    if kind == "hashed":
        model = dsir.fit_hashed_importance(tgt, raw, n_buckets=1 << 12)
    else:
        model = dsir.fit_term_importance(
            _texts(TARGET_VOCAB, 10, 11), _texts(RAW_VOCAB, 10, 12)
        )
    docs = _mk(spark, TARGET_VOCAB + RAW_VOCAB, 30, 13, start=500)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"], r["logw"])
        for r in dsir.importance_logweights(docs, model).collect()
    }
    assert len(got) == 30
    for r in docs.collect():
        nf, lw = _py_score(model, r["text"])
        assert got[r["doc_id"]] == (nf, lw, lw / 1e6), r["doc_id"]


def test_target_like_docs_outscore_raw_like(spark):
    tgt = _mk(spark, TARGET_VOCAB, 25, 21)
    raw = _mk(spark, RAW_VOCAB, 25, 22, start=100)
    model = dsir.fit_hashed_importance(tgt, raw, n_buckets=1 << 14)
    probe_t = _mk(spark, TARGET_VOCAB, 10, 23, start=1000)
    probe_r = _mk(spark, RAW_VOCAB, 10, 24, start=2000)
    st = [r["logw"] for r in dsir.importance_logweights(probe_t, model).collect()]
    sr = [r["logw"] for r in dsir.importance_logweights(probe_r, model).collect()]
    assert min(st) > max(sr)  # fully separated domains


def test_null_and_empty_docs_present_with_zero(spark):
    docs = spark.createDataFrame(
        [(1, "theorem proof"), (2, None), (3, ""), (4, "!!! ...")],
        "doc_id long, text string",
    )
    model = dsir.fit_term_importance(["theorem proof"], ["click buy"])
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir.importance_logweights(docs, model).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == (0, 0) and got[3] == (0, 0) and got[4] == (0, 0)
    assert got[1][0] == 3  # 2 unigrams + 1 bigram


def test_empty_ratio_table_scores_default(spark):
    """A model whose every ratio equals the default (identical corpora)
    ships an empty table; every feature then scores the default."""
    model = dsir.fit_term_importance(["a b c"], ["a b c"])
    assert model["ratio_micro"] == {}
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    row = dsir.importance_logweights(docs, model).collect()[0]
    assert row["logw_micro"] == 3 * model["default_micro"]


# ----------------------------------------------------------- selection


def _scored(spark, n=60):
    docs = _mk(spark, TARGET_VOCAB + RAW_VOCAB, n, 31)
    model = dsir.fit_term_importance(
        _texts(TARGET_VOCAB, 10, 32), _texts(RAW_VOCAB, 10, 33)
    )
    return dsir.importance_logweights(docs, model)


def test_select_top_importance_deterministic(spark):
    scored = _scored(spark)
    top = dsir.select_top_importance(scored, 10).collect()
    assert len(top) == 10
    ranked = sorted(
        scored.collect(), key=lambda r: (-r["logw_micro"], r["doc_id"])
    )[:10]
    assert [r["doc_id"] for r in top] == [r["doc_id"] for r in ranked]


def test_importance_resample_without_replacement_and_deterministic(spark):
    scored = _scored(spark).localCheckpoint()
    s1 = [r["doc_id"] for r in dsir.importance_resample(scored, 15, seed=7).collect()]
    s2 = [r["doc_id"] for r in dsir.importance_resample(scored, 15, seed=7).collect()]
    assert s1 == s2 and len(set(s1)) == 15
    s3 = [r["doc_id"] for r in dsir.importance_resample(scored, 15, seed=8).collect()]
    assert set(s1) != set(s3)  # a new seed re-deals


def test_importance_resample_prefers_heavy_docs(spark):
    """Across seeds, the highest-weight documents are sampled far more
    often than the lowest-weight ones (∝ exp(logw) at T=1)."""
    scored = _scored(spark).localCheckpoint()
    rows = sorted(scored.collect(), key=lambda r: -r["logw_micro"])
    heavy = {r["doc_id"] for r in rows[:10]}
    light = {r["doc_id"] for r in rows[-10:]}
    h_hits = l_hits = 0
    for seed in range(20):
        picked = {
            r["doc_id"]
            for r in dsir.importance_resample(scored, 10, seed=seed).collect()
        }
        h_hits += len(picked & heavy)
        l_hits += len(picked & light)
    assert h_hits > 5 * max(l_hits, 1)


def test_low_temperature_recovers_top_k(spark):
    scored = _scored(spark).localCheckpoint()
    top = {r["doc_id"] for r in dsir.select_top_importance(scored, 8).collect()}
    cold = {
        r["doc_id"]
        for r in dsir.importance_resample(scored, 8, seed=3, temperature=1e-6).collect()
    }
    assert cold == top


def test_resample_rejects_bad_params(spark):
    scored = _scored(spark, n=5)
    with pytest.raises(ValueError):
        dsir.importance_resample(scored, 0)
    with pytest.raises(ValueError):
        dsir.gumbel_key_expr("doc_id", temperature=0.0)
    with pytest.raises(ValueError):
        dsir.select_top_importance(scored, 0)


# ----------------------------------------------- streaming expression


def test_logweight_expr_matches_scorer_exactly(spark):
    model = dsir.fit_term_importance(
        _texts(TARGET_VOCAB, 10, 41), _texts(RAW_VOCAB, 10, 42)
    )
    docs = spark.createDataFrame(
        [(1, "theorem click proof"), (2, None), (3, "unseen words entirely")],
        "doc_id long, text string",
    )
    via_expr = {
        r["doc_id"]: r["lw"]
        for r in docs.select(
            "doc_id", dsir.logweight_expr(model).alias("lw")
        ).collect()
    }
    via_scorer = {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_logweights(docs, model).collect()
    }
    assert via_expr == via_scorer


def test_logweight_expr_guards(spark):
    hashed = {"kind": "hashed", "ratio_micro": {}, "default_micro": 0,
              "bigrams": True, "n_buckets": 4}
    with pytest.raises(ValueError):
        dsir.logweight_expr(hashed)
    big = dsir.fit_term_importance(["a"], ["b"])
    with pytest.raises(ValueError):
        dsir.logweight_expr(big, max_terms=0)


# ------------------------------------------------------ DuckDB oracle


def test_term_scoring_duckdb_oracle(spark):
    """The term-kind scoring is SQL-expressible: an independent DuckDB
    query (same tokenize, LEFT JOIN to the literal ratio table,
    COALESCE to the default, integer sum) reproduces logw_micro exactly
    — the basis of the registered driver row."""
    duckdb = pytest.importorskip("duckdb")
    model = dsir.fit_term_importance(
        _texts(TARGET_VOCAB, 8, 51), _texts(RAW_VOCAB, 8, 52)
    )
    docs = _mk(spark, TARGET_VOCAB + RAW_VOCAB, 40, 53)
    pdf = docs.toPandas()
    vals = ", ".join(
        f"('{t}', {v})" for t, v in sorted(model["ratio_micro"].items())
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = f"""
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(
               text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    uni AS (
      SELECT doc_id, toks[i] AS term
      FROM base, UNNEST(generate_series(1, len(toks))) AS t(i)
    ),
    big AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS term
      FROM base, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 2
    ),
    terms AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
    r(term, r_micro) AS (VALUES {vals}),
    s AS (
      SELECT doc_id, COUNT(*) AS n_feats,
             SUM(COALESCE(r.r_micro, {model['default_micro']})) AS lw
      FROM terms LEFT JOIN r USING (term) GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(s.n_feats, 0) AS n_feats,
           CAST(COALESCE(s.lw, 0) AS BIGINT) AS logw_micro
    FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
    """
    oracle = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir.importance_logweights(docs, model).collect()
    }
    assert got == oracle


# ----------------------------------------------------------- plan pins


def test_scoring_plan_broadcast_no_python(spark):
    model = dsir.fit_term_importance(
        _texts(TARGET_VOCAB, 5, 61), _texts(RAW_VOCAB, 5, 62)
    )
    docs = _mk(spark, TARGET_VOCAB, 5, 63)
    plan = dsir.importance_logweights(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_selection_plan_is_take_ordered(spark):
    scored = _scored(spark, n=10)
    plan = dsir.select_top_importance(scored, 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    plan2 = dsir.importance_resample(scored, 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan2
