#!/usr/bin/env python
"""Same-session A/B for the r9 PQ SEARCH rework (r8 verdict item 3):
search-only with PREBUILT codes and GIVEN centroids — the profiled
~8-stage, 4.1-4.9 s floor — old shape (exploded-codes ADC join +
(query, neighbor) groupBy + two coarse passes) vs the r9 fused shape
(unexploded codes, per-query LUT as ONE broadcast array row, ADC as a
narrow array-lookup projection; vacuous full-probe coarse pass
short-circuited for filtered batches).

Old arm = the r8 pq_topk frozen below (private kernels imported from
the module, search DAG verbatim). Results asserted EXACTLY equal
(same rows, same 9-dp cosines, same ranks) before timing; interleaved
median-of-5 per arm + load telemetry.

Run: python tools/ab_pq_search_r9.py [sf_dir]
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

from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (
    cpu_busy as _cpu_busy,
)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.functions import vectors as vx  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators import pq  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators.pq import (  # noqa: E402
    _check_model,
    _dot_frame,
    _flat_norms2,
    _vec_frame,
    _TERM_SCALE,
)
from topn_clashroyal_etl_sql_snapshot_spark.operators.similarity import (  # noqa: E402
    _nearest_centroids,
    _with_norm,
    ivf_centroids,
)




def pq_topk_old(
    embeddings: DataFrame,
    model: dict,
    k: int = 10,
    n_coarse: int = 16,
    nprobe: int = 4,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    coarse_centroids=None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """The r8 search DAG, verbatim (git 7e84d58 pq.py::pq_topk)."""
    _check_model(model)
    if k < 1 or rerank < 1:
        raise ValueError(f"k and rerank must be ≥ 1, got k={k} rerank={rerank}")
    cents = (
        coarse_centroids
        if coarse_centroids is not None
        else ivf_centroids(embeddings, n_coarse, id_col, vec_col)
    )
    corpus_assign = _nearest_centroids(embeddings, cents, 1, id_col, vec_col)
    q = embeddings if query_filter is None else embeddings.filter(query_filter)
    query_probe = _nearest_centroids(q, cents, nprobe, id_col, vec_col)
    cand = (
        query_probe.withColumnRenamed("id", "query_id")
        .join(corpus_assign.withColumnRenamed("id", "neighbor_id"), "cidx")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )

    if codes is None:
        codes = pq.pq_encode(embeddings, model, id_col, vec_col)
    n2 = _flat_norms2(model)
    ncodes = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("s", "code"),
    ).withColumn(
        "vnorm2_part",
        F.element_at(
            n2, (F.col("s") * model["k"] + F.col("code") + 1).cast("int")
        ),
    )

    qvecs = _vec_frame(q, id_col, vec_col, dim=model["dim"])
    lut = _dot_frame(qvecs, model, id_alias="query_id").select(
        "query_id",
        "s",
        F.posexplode("dots").alias("code", "dot_scaled"),
    ).withColumn(
        "qdot", F.col("dot_scaled").cast("double") / F.lit(_TERM_SCALE)
    )
    qnorms = _with_norm(q, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_norm").alias("qnorm")
    )

    batch_hint = F.broadcast if query_filter is not None else (lambda df: df)
    approx = (
        cand.join(ncodes, "neighbor_id")
        .join(batch_hint(lut), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum("qdot").alias("adot"),
            F.sqrt(F.sum("vnorm2_part")).alias("vnorm"),
        )
        .join(batch_hint(qnorms), "query_id")
        .withColumn(
            "approx_cos",
            F.round(
                F.col("adot")
                / F.when(
                    (F.col("qnorm") > 0) & (F.col("vnorm") > 0),
                    F.col("qnorm") * F.col("vnorm"),
                ),
                9,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc_nulls_last("approx_cos"), F.col("neighbor_id")
    )
    survivors = (
        approx.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= rerank * k)
        .select("query_id", "neighbor_id")
    )

    vecs = _with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vv"),
        F.col("_norm").alias("nn"),
    )
    exact = (
        batch_hint(
            batch_hint(survivors).join(
                vecs.withColumnsRenamed(
                    {"id": "query_id", "vv": "v1", "nn": "n1"}
                ),
                "query_id",
            )
        )
        .join(
            vecs.withColumnsRenamed(
                {"id": "neighbor_id", "vv": "v2", "nn": "n2"}
            ),
            "neighbor_id",
        )
        .withColumn(
            "cosine",
            F.round(
                vx.cosine_prenormed(
                    vx.dot(F.col("v1"), F.col("v2")), F.col("n1"), F.col("n2")
                ),
                9,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import (
        read_testdata,
    )

    spark = get_spark(app_name="ab_pq_search_r9")
    emb = read_testdata(spark, sf_dir, "embeddings")
    model = pq.fit_pq_codebooks(emb, m=4, k=16, lloyd_rounds=2, sample_rows=1000)
    cents = ivf_centroids(emb, 16)
    codes = pq.pq_encode(emb, model).persist()
    codes.count()
    emb = emb.persist()
    emb.count()

    kw = dict(
        k=5,
        n_coarse=16,
        nprobe=16,
        rerank=4,
        query_filter=F.col("vec_id") < 40,
        coarse_centroids=cents,
        codes=codes,
    )

    def old():
        return pq_topk_old(emb, model, **kw).orderBy("query_id", "rank")

    def new():
        return pq.pq_topk(emb, model, **kw).orderBy("query_id", "rank")

    a = [tuple(r) for r in old().collect()]
    b = [tuple(r) for r in new().collect()]
    assert a == b, (
        f"RESULTS DIFFER: {len(a)} vs {len(b)} rows; "
        f"first diff {next((x for x in zip(a, b) if x[0] != x[1]), None)}"
    )
    print(f"IDENTICAL: {len(a)} rows", flush=True)

    import gc

    arms = {"old": old, "new": new}
    samples = {k_: [] for k_ in arms}
    loads = {k_: [] for k_ in arms}
    for _ in range(5):
        for name, mk in arms.items():
            gc.collect()
            l0 = os.getloadavg()[0]
            b0, t0 = _cpu_busy()
            w0 = time.perf_counter()
            mk().collect()
            dt = time.perf_counter() - w0
            b1, t1 = _cpu_busy()
            samples[name].append(dt)
            loads[name].append(
                {
                    "load1": round(l0, 2),
                    "cpu_busy": round((b1 - b0) / max(t1 - t0, 1e-9), 3),
                }
            )
    for name in arms:
        med = statistics.median(samples[name])
        print(
            f"{name}: m5={med:.3f}s samples="
            f"{[round(s, 3) for s in samples[name]]} load={loads[name]}",
            flush=True,
        )
    o, n = (statistics.median(samples[k_]) for k_ in ("old", "new"))
    print(f"VERDICT: ratio new/old = {n / o:.2f} ({n:.3f} vs {o:.3f})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
