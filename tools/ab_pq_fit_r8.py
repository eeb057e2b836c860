#!/usr/bin/env python
"""Same-session A/B for the r8 PQ-fit fusion (SCALE.md playbook: never
compare timings across sessions — ±20-30% drift on identical code).

A = r7 shape: per Lloyd round, assignment frame shuffle-joined against
    a checkpointed (id, s, t, x) corpus explode, then (s,code,t) agg.
B = r8 shape: assignment aggregation carries the subvector
    (``with_subvec``); mean recompute stacks on it — one fused lineage,
    no corpus-explode join, no checkpoint; plus the width histogram
    replacing the mode-agg + off-width-count job pair.

Both run the SAME integer scales (current module constants) so the A/B
isolates plan shape. Prints per-variant fit medians and the end-to-end
bench-entry (fit + search collect) medians, plus a model-equality
check (the fused rewrite must be math-identical).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.operators import pq  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators.pq import (  # noqa: E402
    _assign_codes,
    _vec_frame,
    _MEAN_SCALE,
)
from topn_clashroyal_etl_sql_snapshot_spark.plans.llm_queries import (  # noqa: E402
    read_testdata,
)
from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
M, K, ROUNDS, SAMPLE = 4, 16, 2, 1000


def fit_old_shape(embeddings, m=M, k=K, lloyd_rounds=ROUNDS,
                  id_col="vec_id", vec_col="embedding", sample_rows=SAMPLE):
    """The r7 fit, reproduced verbatim in shape (dimsx checkpoint +
    per-round join; separate mode-agg and off-width count jobs)."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        hash_sample_target,
    )

    embeddings = hash_sample_target(embeddings, id_col, sample_rows)
    present = embeddings.filter(F.col(vec_col).isNotNull())
    dim = int(present.agg(F.mode(F.size(vec_col)).alias("dim")).first()["dim"])
    present.filter(F.size(vec_col) != dim).count()  # off_width job (r7 shape)
    sd = dim // m
    vecs = _vec_frame(embeddings, id_col, vec_col, dim=dim).localCheckpoint(
        eager=False
    )
    seeds = vecs.orderBy(F.xxhash64(F.col("id")), F.col("id")).limit(k).collect()
    books = [
        [[float(x) for x in r["v"][s * sd : (s + 1) * sd]] for r in seeds]
        for s in range(m)
    ]

    def _model(bs):
        return {
            "m": m, "k": k, "sub_dim": sd, "dim": dim, "codebooks": bs,
            "norms2": [[sum(x * x for x in c) for c in book] for book in bs],
        }

    dimsx = (
        vecs.select("id", F.posexplode("v").alias("d", "x"))
        .withColumn("s", (F.col("d") / sd).cast("int"))
        .withColumn("t", F.col("d") % sd)
        .localCheckpoint(eager=False)
    )
    for _ in range(lloyd_rounds):
        assign = _assign_codes(vecs, _model(books))
        stats = (
            dimsx.join(assign, ["id", "s"])
            .groupBy("s", "code", "t")
            .agg(
                F.sum(
                    F.round(F.col("x") * F.lit(_MEAN_SCALE)).cast("long")
                ).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        acc = {}
        for r in stats:
            acc.setdefault((r["s"], r["code"]), {})[r["t"]] = r["sx"] / (
                r["n"] * _MEAN_SCALE
            )
        new_books = [
            [
                [acc[(s, j)][t] for t in range(sd)] if (s, j) in acc
                else books[s][j]
                for j in range(k)
            ]
            for s in range(m)
        ]
        if new_books == books:
            break
        books = new_books
    return _model(books)


def main():
    spark = get_spark(app_name="ab_pq_fit_r8")
    emb = read_testdata(spark, SF_DIR, "embeddings")
    # warm-up: codegen for both lineage shapes, once, untimed
    fit_old_shape(emb)
    pq.fit_pq_codebooks(emb, m=M, k=K, lloyd_rounds=ROUNDS, sample_rows=SAMPLE)

    model_a = fit_old_shape(emb)
    model_b = pq.fit_pq_codebooks(
        emb, m=M, k=K, lloyd_rounds=ROUNDS, sample_rows=SAMPLE
    )
    print("models identical:", model_a == model_b)

    def timeit(fn, n=3):
        out = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            out.append(round(time.perf_counter() - t0, 4))
        return out

    def entry(fit):
        def run():
            model = fit(emb) if fit is fit_old_shape else pq.fit_pq_codebooks(
                emb, m=M, k=K, lloyd_rounds=ROUNDS, sample_rows=SAMPLE
            )
            pq.pq_topk(
                emb, model, k=5, n_coarse=16, nprobe=16, rerank=4,
                query_filter=F.col("vec_id") < 40,
            ).orderBy("query_id", "rank").collect()
        return run

    fa = timeit(lambda: fit_old_shape(emb))
    fb = timeit(lambda: pq.fit_pq_codebooks(
        emb, m=M, k=K, lloyd_rounds=ROUNDS, sample_rows=SAMPLE))
    ea = timeit(entry(fit_old_shape))
    eb = timeit(entry(None))
    print(f"fit   A(old dimsx-join): {fa} median {statistics.median(fa)}")
    print(f"fit   B(fused subvec)  : {fb} median {statistics.median(fb)}")
    print(f"entry A(old)           : {ea} median {statistics.median(ea)}")
    print(f"entry B(new)           : {eb} median {statistics.median(eb)}")
    spark.stop()


if __name__ == "__main__":
    main()
