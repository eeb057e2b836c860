"""LM perplexity scoring tests (operators/lm_score.py): exact parity
with a pure-Python twin, in-domain vs gibberish separation, edge
cases, the training fuse, and the broadcast plan pin."""

from __future__ import annotations

import math
import random

import pytest

from topn_clashroyal_etl_sql_snapshot_spark.operators import lm_score


def _py_score(text: str, model: dict):
    n = model["n"]
    if text is None or len(text) < n:
        return 0, None

    def lp(g):
        if g in model["logp"]:
            return model["logp"][g]
        if g[:-1] in model["ctx_floor"]:
            return model["ctx_floor"][g[:-1]]
        return model["floor"]

    def micro(v):
        # Spark's F.round = BigDecimal(Double.toString(v)) HALF_UP;
        # Python repr() is the same shortest decimal string
        from decimal import ROUND_HALF_UP, Decimal

        return int(Decimal(repr(v * 1e6)).quantize(Decimal(1), ROUND_HALF_UP))

    lps = [micro(lp(text[i : i + n])) for i in range(len(text) - n + 1)]
    return len(lps), sum(lps) / (len(lps) * 1e6)


REF = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain stays mainly in the plain and the cat sat on the mat "
) * 5


def test_model_is_a_proper_conditional_distribution(spark):
    ref = spark.createDataFrame([(1, REF)], "doc_id long, text string")
    model = lm_score.train_char_lm(ref, n=3, add_k=0.5)
    # grouped by context, conditional probs + unseen mass sum to 1
    by_ctx: dict[str, list] = {}
    for g, lp in model["logp"].items():
        by_ctx.setdefault(g[:2], []).append(math.exp(lp))
    alphabet = set(REF)
    v = len(alphabet) + 1
    for ctx, ps in by_ctx.items():
        seen = sum(ps)
        # unseen continuations of this ctx each carry k/(C + kV);
        # total mass = seen + (V - len(ps)) * that = 1
        ctx_total = sum(
            1 for i in range(len(REF) - 2) if REF[i : i + 2] == ctx
        )
        unseen_each = 0.5 / (ctx_total + 0.5 * v)
        assert seen + (v - len(ps)) * unseen_each == pytest.approx(1.0), ctx


def test_scores_match_python_twin_exactly(spark):
    ref = spark.createDataFrame([(1, REF)], "doc_id long, text string")
    model = lm_score.train_char_lm(ref, n=3)
    rng = random.Random(5)
    docs = [
        (1, "the rain in spain"),
        (2, "the cat sat on the mat and the dog ran"),
        (3, "zzxqj vvkpw qqqgh"),  # out-of-domain junk
        (4, "ab"),                 # shorter than n
        (5, None),
        (6, ""),
        (7, "".join(rng.choice("etaoin shrdlu") for _ in range(200))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["avg_logprob"], r["ppl"])
        for r in lm_score.lm_perplexity(df, model).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    for i, t in docs:
        n_g, avg = _py_score(t, model)
        assert got[i][0] == n_g, i
        if avg is None:
            assert got[i][1] is None and got[i][2] is None
        else:
            assert got[i][1] == pytest.approx(avg, rel=1e-12)
            assert got[i][2] == pytest.approx(math.exp(-avg), rel=1e-12)


def test_in_domain_beats_gibberish(spark):
    ref = spark.createDataFrame([(1, REF)], "doc_id long, text string")
    model = lm_score.train_char_lm(ref, n=3)
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"),
         (2, "xjqz wvvk pqgh zzzt mmnb")],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"] for r in lm_score.lm_perplexity(df, model).collect()}
    assert ppl[1] < ppl[2] / 3  # clear separation, not a coin flip


def test_training_fuse_and_sampling(spark):
    docs = spark.createDataFrame(
        [(i, "some text here") for i in range(50)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="refuses to collect"):
        lm_score.train_char_lm(docs, max_docs=10)
    m = lm_score.train_char_lm(docs, sample_fraction=0.15, max_docs=10)
    assert m["logp"] and m["floor"] < 0
    # deterministic: same sample, same model
    assert m == lm_score.train_char_lm(docs, sample_fraction=0.15, max_docs=10)


def test_scoring_plan_broadcasts_and_stays_jvm(spark):
    ref = spark.createDataFrame([(1, REF)], "doc_id long, text string")
    model = lm_score.train_char_lm(ref, n=3)
    df = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    plan = (
        lm_score.lm_perplexity(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_expr_form_matches_join_form_exactly(spark):
    """lm_avg_logprob_expr (the stateless streaming twin) must equal
    lm_perplexity's avg_logprob BIT-FOR-BIT on every document shape —
    same backoff, same micro-nat quantization, same division."""
    ref = spark.createDataFrame([(1, REF)], "doc_id long, text string")
    model = lm_score.train_char_lm(ref, n=3)
    rng = random.Random(7)
    docs = [
        (1, "the rain in spain"),
        (2, "zzxqj vvkpw qqqgh mmnb"),
        (3, "ab"),
        (4, None),
        (5, ""),
        (6, "".join(rng.choice("etaoin shrdlu") for _ in range(300))),
        (7, "ünïcödé tëxt with odd chars €§"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    join_form = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm_score.lm_perplexity(df, model).collect()
    }
    expr_form = {
        r["doc_id"]: r["avg"]
        for r in df.select(
            "doc_id", lm_score.lm_avg_logprob_expr(model).alias("avg")
        ).collect()
    }
    assert expr_form == join_form  # exact, including the NULLs


def test_expr_form_model_size_fuse(spark):
    ref = spark.createDataFrame([(1, REF)], "doc_id long, text string")
    model = lm_score.train_char_lm(ref, n=3)
    with pytest.raises(ValueError, match="max_model_entries"):
        lm_score.lm_avg_logprob_expr(model, max_model_entries=3)
