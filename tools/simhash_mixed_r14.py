#!/usr/bin/env python
"""r14 mixed-regime simhash measurement (r13 verdict, next #3): the
Σ C(m,2) estimator in ``dedup.simhash_verified_pairs`` is a GLOBAL
plan decision — on a corpus that is half template-compressed and half
spread, the template cluster alone pushes the WHOLE corpus onto the
screenless exact plan, even though the spread half would have pruned
fine under the pigeonhole screen. This harness, at sf0.1-documents
scale (5k docs), measures:

1. the estimator's own cost share (the pieces aggregation alone vs
   the full verified-pairs run) — the price of making the decision;
2. both plans FORCED on the same mixed corpus (screened assembled by
   hand vs the screenless path the estimator picks) — pinning which
   plan actually wins in the mixed regime and by how much;
3. the same on the all-spread half alone — the worst case of the
   global decision (the subpopulation that pays the screenless price
   it didn't need).

Correctness equality of the two plans on the mixed corpus is pinned
in tests/test_dedup.py::test_simhash_mixed_regime_corpus_stays_correct;
this tool records the COST side for SCALE.md. Run idle:
python tools/simhash_mixed_r14.py
"""

from __future__ import annotations

import gc
import json
import os
import random
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

N_TEMPLATE = 2_500
N_SPREAD = 2_500
CHUNKS, PIECE_RADIUS, THRESHOLD = 8, 1, 0.5


def corpus(spark, n_template: int, n_spread: int):
    rng = random.Random(7)
    rows = [
        (i, "common template words repeated across every document "
            "in this synthetic crawl slice " * 3 + f"tail marker {i % 7}")
        for i in range(n_template)
    ] + [
        (1_000_000 + i, f"doc {i} " + " ".join(
            f"w{rng.randrange(1_000_000)}" for _ in range(40)))
        for i in range(n_spread)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _m3(fn, n=3):
    samples = []
    for _ in range(n):
        gc.collect()
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    return round(statistics.median(samples), 3), samples


def main() -> None:
    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="simhash_mixed_r14")
    load1 = os.getloadavg()[0]

    mixed = corpus(spark, N_TEMPLATE, N_SPREAD).localCheckpoint(eager=True)
    spread = corpus(spark, 0, N_SPREAD).localCheckpoint(eager=True)

    # warm codegen
    dedup.simhash_verified_pairs(
        mixed.limit(200), threshold=THRESHOLD,
        chunks=CHUNKS, piece_radius=PIECE_RADIUS,
    ).collect()

    # 1. estimator cost share: the pieces Σ C(m,2) aggregation alone
    def estimator_only():
        toks = dedup.token_arrays(mixed).localCheckpoint(eager=False)
        fps = dedup.simhash_fingerprints(mixed, toks=toks)
        pieces = dedup._simhash_pieces(fps, CHUNKS)
        (
            pieces.groupBy("chunk", "val")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("v"))
            .collect()
        )

    est_m3, est_samples = _m3(estimator_only)

    # 2. the chosen plan end to end on the mixed corpus (estimator
    #    fires -> screenless), vs the screened plan forced by hand
    def chosen():
        dedup.simhash_verified_pairs(
            mixed, threshold=THRESHOLD,
            chunks=CHUNKS, piece_radius=PIECE_RADIUS,
        ).collect()

    def screened_forced():
        toks = dedup.token_arrays(mixed).localCheckpoint(eager=False)
        fps = dedup.simhash_fingerprints(mixed, toks=toks)
        cands = dedup.simhash_candidate_pairs(
            fps, max_hamming=2 * CHUNKS - 1,
            chunks=CHUNKS, piece_radius=PIECE_RADIUS,
        )
        postings = dedup.hashed_postings(mixed, toks=toks)
        dedup.true_jaccard_for_pairs_dense(
            cands.localCheckpoint(eager=False), postings, THRESHOLD
        ).collect()

    chosen_m3, chosen_samples = _m3(chosen)
    screened_m3, screened_samples = _m3(screened_forced)

    # 3. the spread half alone: estimator stays quiet there (screened
    #    plan), vs the screenless price it would pay under a global
    #    template-driven decision
    def spread_auto():
        dedup.simhash_verified_pairs(
            spread, threshold=THRESHOLD,
            chunks=CHUNKS, piece_radius=PIECE_RADIUS,
        ).collect()

    def spread_screenless_forced():
        toks = dedup.token_arrays(spread).localCheckpoint(eager=False)
        postings = dedup.hashed_postings(spread, toks=toks)
        fps = dedup.simhash_fingerprints(spread, toks=toks)
        p = postings
        sizes = p.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        inter = (
            p.select(F.col("id").alias("id1"), "sh")
            .join(p.select(F.col("id").alias("id2"), "sh"), "sh")
            .filter(F.col("id1") < F.col("id2"))
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        jac = (
            inter.join(
                sizes.withColumnsRenamed({"id": "id1", "n_sh": "n1"}), "id1"
            )
            .join(sizes.withColumnsRenamed({"id": "id2", "n_sh": "n2"}), "id2")
            .withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_common")),
            )
            .filter(F.col("jaccard") >= THRESHOLD)
        )
        (
            jac.join(fps.withColumnsRenamed({"id": "id1", "sh64": "h1"}), "id1")
            .join(fps.withColumnsRenamed({"id": "id2", "sh64": "h2"}), "id2")
            .filter(
                F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
                <= 2 * CHUNKS - 1
            )
            .collect()
        )

    spread_auto_m3, spread_auto_samples = _m3(spread_auto)
    spread_forced_m3, spread_forced_samples = _m3(spread_screenless_forced)

    for rec in (
        {"probe": "estimator_only", "m3": est_m3, "samples": est_samples},
        {"probe": "mixed_chosen_screenless", "m3": chosen_m3,
         "samples": chosen_samples},
        {"probe": "mixed_screened_forced", "m3": screened_m3,
         "samples": screened_samples},
        {"probe": "spread_auto_screened", "m3": spread_auto_m3,
         "samples": spread_auto_samples},
        {"probe": "spread_screenless_forced", "m3": spread_forced_m3,
         "samples": spread_forced_samples},
    ):
        print(json.dumps({**rec, "load1": round(load1, 2)}), flush=True)
    print(json.dumps({
        "estimator_share_of_chosen": round(est_m3 / chosen_m3, 3),
        "screened_vs_screenless_mixed": round(screened_m3 / chosen_m3, 3),
        "spread_worstcase_penalty": round(
            spread_forced_m3 / spread_auto_m3, 3
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
