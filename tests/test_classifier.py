"""Hashed-feature logistic classifier tests (operators/classifier.py):
separable-data accuracy, exact integer-margin parity with a Python
twin, determinism, multiclass OVR, edge cases, and the broadcast/no-
Python plan pin."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import classifier, dedup

POS_WORDS = "excellent wonderful great clear helpful accurate readable".split()
NEG_WORDS = "zzxqj garbled noise spam lorem filler clickbait".split()


def _mk_docs(spark, n=120, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = i % 2
        vocab = POS_WORDS if y else NEG_WORDS
        text = " ".join(rng.choice(vocab) for _ in range(20))
        rows.append((i, text, y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_separable_data_learns_and_scores(spark):
    docs = _mk_docs(spark)
    model = classifier.train_hashed_logistic(docs, "y", epochs=20)
    scored = classifier.score_hashed_logistic(docs, model)
    got = {
        r["doc_id"]: r["prob"]
        for r in scored.join(docs.select("doc_id", "y"), "doc_id").collect()
    }
    acc = sum(
        1 for i, p in got.items() if (p >= 0.5) == bool(i % 2)
    ) / len(got)
    assert acc == 1.0  # fully separable vocabularies


def test_margin_matches_python_twin_exactly(spark):
    """Integer micro-margin contract: the Spark margin equals a pure-
    Python dot product of raw counts with the model's micro weights —
    exact equality, not approx (partition-order independence)."""
    docs = _mk_docs(spark, n=40)
    model = classifier.train_hashed_logistic(docs, "y", epochs=5)
    scored = {
        r["doc_id"]: r["margin"]
        for r in classifier.score_hashed_logistic(docs, model).collect()
    }
    feats = classifier.hashed_features(docs, model["n_buckets"]).collect()
    by_doc: dict[int, int] = {}
    for r in feats:
        by_doc[r["id"]] = by_doc.get(r["id"], 0) + model["w_micro"].get(
            r["feat"], 0
        ) * r["cnt"]
    for i in scored:
        want = (by_doc.get(i, 0) + model["bias_micro"]) / 1e6
        assert scored[i] == want, i


def test_training_is_deterministic(spark):
    docs = _mk_docs(spark, n=60)
    a = classifier.train_hashed_logistic(docs, "y", epochs=6)
    b = classifier.train_hashed_logistic(docs, "y", epochs=6)
    assert a == b


def test_null_and_empty_docs_score_bias(spark):
    docs = _mk_docs(spark, n=20)
    model = classifier.train_hashed_logistic(docs, "y", epochs=5)
    edge = spark.createDataFrame(
        [(100, None), (101, ""), (102, "   ")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["margin"]
        for r in classifier.score_hashed_logistic(edge, model).collect()
    }
    want = model["bias_micro"] / 1e6
    assert got == {100: want, 101: want, 102: want}


def test_multiclass_ovr_predicts_language_style(spark):
    rng = random.Random(9)
    vocabs = {
        "en": "the and of to in is was for with that".split(),
        "de": "der die und das ist nicht ein mit auf zu".split(),
        "fr": "le la et les des une dans est pour que".split(),
    }
    rows = []
    i = 0
    for lang, words in vocabs.items():
        for _ in range(30):
            rows.append((i, " ".join(rng.choice(words) for _ in range(15)), lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ovr = classifier.train_hashed_logistic_ovr(docs, "lang", epochs=15)
    assert ovr["classes"] == ["de", "en", "fr"]
    pred = {
        r["doc_id"]: r["predicted"]
        for r in classifier.score_hashed_logistic_ovr(docs, ovr).collect()
    }
    truth = {r[0]: r[2] for r in rows}
    acc = sum(1 for i in pred if pred[i] == truth[i]) / len(pred)
    assert acc == 1.0


def test_hashed_features_bigrams_and_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id long, text string"
    )
    nb = 64
    rows = classifier.hashed_features(docs, n_buckets=nb).collect()
    assert {r["id"] for r in rows} == {1}  # null/empty -> no rows
    # 3 unigrams + 2 bigrams, all within the bucket space
    assert sum(r["cnt"] for r in rows) == 5
    assert all(0 <= r["feat"] < nb for r in rows)


def test_scoring_plan_broadcasts_and_stays_jvm(spark):
    docs = _mk_docs(spark, n=20)
    model = classifier.train_hashed_logistic(docs, "y", epochs=3)
    plan = (
        classifier.score_hashed_logistic(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_training_job_count_is_epoch_bound_not_data_bound(spark):
    """The scale contract: one gradient round-trip per epoch (+ the
    fixed setup jobs) — the fit must not launch per-feature or per-doc
    driver work."""
    docs = _mk_docs(spark, n=60)
    docs.count()
    sc = spark.sparkContext

    def jobs_for(epochs):
        group = f"clf-fit-{epochs}"
        sc.setJobGroup(group, "classifier job-count pin")
        try:
            classifier.train_hashed_logistic(docs, "y", epochs=epochs)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j2, j6 = jobs_for(2), jobs_for(6)
    per_epoch = (j6 - j2) / 4
    # AQE materializes each exchange stage as its own job, so one
    # epoch's two logical round-trips (gradient + bias) decompose into
    # ~a dozen stage jobs — the pin is that the count is a CONSTANT per
    # epoch (no per-feature/per-doc driver loops hiding anywhere)
    assert per_epoch <= 20, (j2, j6)


def test_margin_expr_matches_scorer_exactly(spark):
    """margin_expr (the stateless streaming twin) must equal
    score_hashed_logistic's margin bit-for-bit — same tokenize, same
    hashing, same integer arithmetic; NULL/empty docs get the bias."""
    docs = _mk_docs(spark, n=40)
    model = classifier.train_hashed_logistic(docs, "y", epochs=8)
    edge = spark.createDataFrame(
        [(200, None), (201, ""), (202, "one unseen zork word")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionAll(edge)
    join_form = {
        r["doc_id"]: r["margin"]
        for r in classifier.score_hashed_logistic(both, model).collect()
    }
    expr_form = {
        r["doc_id"]: r["m"]
        for r in both.select(
            "doc_id", classifier.margin_expr(model).alias("m")
        ).collect()
    }
    assert expr_form == join_form


def test_margin_expr_weight_fuse(spark):
    docs = _mk_docs(spark, n=20)
    model = classifier.train_hashed_logistic(docs, "y", epochs=3)
    with pytest.raises(ValueError, match="max_weights"):
        classifier.margin_expr(model, max_weights=1)


def test_batched_ovr_equals_sequential_fits_exactly(spark):
    """The batched OVR trainer advances every class per epoch in two
    shared aggregations; because the per-class problems are
    independent, its models must equal per-class train_hashed_logistic
    runs EXACTLY — same integer weights, same biases."""
    rng = random.Random(13)
    vocabs = {
        "en": "the and of to in".split(),
        "de": "der die und das ist".split(),
    }
    rows = []
    i = 0
    for lang, words in vocabs.items():
        for _ in range(20):
            rows.append((i, " ".join(rng.choice(words) for _ in range(10)), lang))
            i += 1
    rows.append((i, None, "en"))  # NULL doc exercises the bias path
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    nb = 1 << 12
    ovr = classifier.train_hashed_logistic_ovr(
        docs, "lang", epochs=5, n_buckets=nb
    )
    feats = classifier.hashed_features(docs, nb)
    for cls in ovr["classes"]:
        seq = classifier.train_hashed_logistic(
            docs.withColumn("_y", (F.col("lang") == cls).cast("int")),
            "_y",
            epochs=5,
            n_buckets=nb,
            feats=feats,
        )
        assert ovr["models"][cls] == seq, cls


def test_ovr_job_count_independent_of_class_count(spark):
    """The batched trainer's scale contract: doubling the class count
    must not grow the number of Spark jobs (sequential OVR would)."""
    rng = random.Random(21)
    rows = [
        (i, " ".join(rng.choice("aa bb cc dd ee ff gg hh".split()) for _ in range(8)),
         f"c{i % 6}")
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    docs.count()
    sc = spark.sparkContext

    def jobs_for(classes):
        group = f"ovr-{len(classes)}"
        sc.setJobGroup(group, "ovr job-count pin")
        try:
            classifier.train_hashed_logistic_ovr(
                docs, "lang", classes=classes, epochs=3, n_buckets=1 << 10
            )
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j2 = jobs_for(["c0", "c1"])
    j6 = jobs_for(["c0", "c1", "c2", "c3", "c4", "c5"])
    assert j6 <= j2 + 2, (j2, j6)


def test_ovr_grad_rows_fuse(spark):
    docs = _mk_docs(spark, n=20)
    with pytest.raises(ValueError, match="max_grad_rows"):
        classifier.train_hashed_logistic_ovr(
            docs, "y", classes=[0, 1], epochs=1, max_grad_rows=10
        )


def test_ovr_scorer_rejects_mismatched_models(spark):
    docs = _mk_docs(spark, n=20)
    ovr = classifier.train_hashed_logistic_ovr(
        docs, "y", classes=[0, 1], epochs=2, n_buckets=1 << 10
    )
    ovr["models"][1]["n_buckets"] = 1 << 11
    with pytest.raises(ValueError, match="different feature parameters"):
        classifier.score_hashed_logistic_ovr(docs, ovr)


def test_classifier_guards_r11(spark):
    """r11 review hardening: NULL/unparseable labels are excluded from
    both trainers instead of crashing the weight update mid-epoch; an
    int-labeled OVR fit works (labels round-trip through string); the
    OVR scorer raises a diagnostic on an empty-class model; wordlist
    keys that cannot match (case/punct/width) are normalized or loudly
    rejected."""
    rows = [
        (0, "spark spark table join", 1),
        (1, "cat dog bird fish", 0),
        (2, "spark table join merge", 1),
        (3, "dog cat fish bird", 0),
        (4, "spark join and dogs", None),     # NULL label
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    m = classifier.train_hashed_logistic(docs, "y", epochs=3)
    assert m["w_micro"]  # fit survived the NULL-label row

    # string labels (int cast nulls them): used to crash; now they are
    # excluded and the fit degenerates gracefully to an empty model
    sdocs = spark.createDataFrame(
        [(0, "a b", "spam"), (1, "c d", "ham")],
        "doc_id long, text string, y string",
    )
    m2 = classifier.train_hashed_logistic(sdocs, "y", epochs=1)
    assert m2["w_micro"] == {} and m2["bias_micro"] == 0

    # OVR with INT labels (used to crash createDataFrame's string schema)
    idocs = spark.createDataFrame(
        [(0, "spark table join", 0), (1, "cat dog bird", 1),
         (2, "spark join merge", 0), (3, "dog fish bird", 1),
         (4, "mystery doc", None)],
        "doc_id long, text string, lang int",
    )
    ovr = classifier.train_hashed_logistic_ovr(idocs, "lang", epochs=2)
    assert ovr["classes"] == [0, 1]
    pred = {
        r["doc_id"]: r["predicted"]
        for r in classifier.score_hashed_logistic_ovr(
            idocs.filter("lang is not null"), ovr
        ).collect()
    }
    assert pred[0] == 0 and pred[1] == 1

    import pytest

    with pytest.raises(ValueError, match="no classes"):
        classifier.score_hashed_logistic_ovr(
            docs, {"classes": [], "models": {}}
        )

    # wordlist normalization: 'Viagra' matches 'viagra' tokens now
    wdocs = spark.createDataFrame(
        [(0, "cheap viagra here"), (1, "clean text only")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in classifier.score_term_weights(
            wdocs, {"Viagra": -1.0}
        ).collect()
    }
    assert out == {0: 1, 1: 0}
    with pytest.raises(ValueError, match="never match"):
        classifier.score_term_weights(wdocs, {"!!!": 1.0})
    with pytest.raises(ValueError, match="never match"):
        classifier.score_term_weights(wdocs, {"three word key": 1.0})
    with pytest.raises(ValueError, match="collide"):
        classifier.score_term_weights(wdocs, {"Spam": 1.0, "spam": 2.0})
