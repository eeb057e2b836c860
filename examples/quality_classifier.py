#!/usr/bin/env python
"""Model-based quality filtering, bootstrapped from weak labels — the
classic quality-classifier recipe (GPT-3 / CCNet style: label a sample
with a cheap signal, fit a fast linear model, gate the full corpus with
the model):

    read documents
      → weak labels on a deterministic hash sample
        (here: the heuristic quality_score ≥ 0.5 verdict stands in
        for "looks like the reference domain"; in production this is
        reference-corpus-vs-crawl)
      → train the hashed-feature logistic classifier on the sample
        (operators/classifier.py — training IS DataFrame algebra)
      → score EVERY document (broadcast weights, exact integer margins)
      → gate at prob ≥ 0.5 and report agreement vs the heuristic on
        the held-out (unsampled) slice

Run:  python examples/quality_classifier.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators import (  # noqa: E402
    classifier,
    sampling,
)
from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import (  # noqa: E402
    read_testdata,
)


def run(spark, sf_dir: str, train_fraction: float = 0.5):
    docs = read_testdata(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "weak_label", (tx.quality_score(F.col("text")) >= 0.5).cast("int")
    )

    # Weak-label a deterministic hash sample for training; everything
    # outside the sample is the honest evaluation slice (hash-keyed →
    # the split replays identically and never leaks).
    train = sampling.hash_sample(labeled, "doc_id", train_fraction)
    n_train = train.count()
    pos = train.agg(F.sum("weak_label")).collect()[0][0] or 0
    print(f"train sample     {n_train} docs ({pos} weak-positive)")

    model = classifier.train_hashed_logistic(train, "weak_label", epochs=15)
    print(f"model            {len(model['w_micro'])} non-zero hashed weights")

    scored = classifier.score_hashed_logistic(docs, model).join(
        labeled.select("doc_id", "weak_label"), "doc_id"
    )
    holdout = scored.join(
        train.select("doc_id"), "doc_id", "left_anti"
    ).withColumn("model_keep", (F.col("prob") >= 0.5).cast("int"))
    agg = holdout.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("model_keep") == F.col("weak_label")).cast("int")
        ).alias("agree"),
        F.sum("model_keep").alias("kept"),
    ).collect()[0]
    agreement = agg["agree"] / agg["n"] if agg["n"] else float("nan")
    print(
        f"holdout          {agg['n']} docs, model keeps {agg['kept']}, "
        f"agreement with heuristic {agreement:.3f}"
    )
    return {
        "n_train": n_train,
        "n_holdout": agg["n"],
        "kept": agg["kept"],
        "agreement": agreement,
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quality-classifier-example")
    run(spark, sf_dir)
    spark.stop()
