"""Production-shape ANN over an embedding corpus: build the compressed
index ONCE, search it MANY times.

Executable documentation for the similarity family's intended
composition at scale (the registered driver rows and bench entries
exercise the fused fit+search shape; THIS is the shape a serving
pipeline runs):

1. **Fit** a PQ model on a hash-bounded sample (constant cost in corpus
   size — measured 1.02x at 3x data, SCALE.md r9) and pick coarse IVF
   pivots once.
2. **Encode** the corpus to the codes frame — M small ints per vector,
   the persistable compressed index (~64x smaller than the vectors).
   Persist it; the raw embeddings are only ever touched again for the
   final re-rank survivors.
3. **Search** query batches against the prebuilt index — coarse prune →
   ADC from broadcast LUTs → exact re-rank; repeated calls never re-fit
   or re-encode.

Run: ``python examples/ann_index.py [sf_dir]``
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import pq
from topn_clashroyal_etl_sql_snapshot_spark.operators.similarity import (
    brute_force_topk,
    ivf_centroids,
)
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import read_testdata


def build_index(spark, sf_dir: str, m: int = 4, k: int = 16):
    """Fit + pivots + encoded corpus — the persist-once artifacts."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    model = pq.fit_pq_codebooks(
        emb, m=m, k=k, lloyd_rounds=2, sample_rows=1000
    )
    cents = ivf_centroids(emb, n_centroids=16)
    # In production: codes.write.parquet(...) — here localCheckpoint
    # stands in for the persisted index (same reuse semantics).
    codes = pq.pq_encode(emb, model).localCheckpoint(eager=True)
    return emb, model, cents, codes


def search(emb, model, cents, codes, query_filter, topk: int = 5,
           rerank: int = 40):
    """One query batch against the prebuilt index: no fit, no encode.

    ``rerank`` is the recall knob for near-tied score distributions:
    the synthetic testdata is ISOTROPIC, so true top-5 cosines sit in
    a dense near-tie band and ADC's quantization noise reorders small
    candidate sets (recall@5 ≈ 0.4 at rerank=4 here — the documented
    'near-tie sets aren't identity-stable' contract, tests/test_pq.py);
    widening exact re-ranking to rerank·k = 200 of 500 recovers it. On
    real clustered embeddings the gap between neighbors and
    non-neighbors is what makes small reranks sufficient."""
    return pq.pq_topk(
        emb,
        model,
        k=topk,
        n_coarse=16,
        nprobe=16,  # synthetic testdata is isotropic: probe all cells
        rerank=rerank,
        query_filter=query_filter,
        coarse_centroids=cents,
        codes=codes,
    )


def run(spark, sf_dir: str) -> dict:
    emb, model, cents, codes = build_index(spark, sf_dir)

    # two query batches against the SAME index
    batch1 = search(emb, model, cents, codes, F.col("vec_id") < 8)
    batch2 = search(
        emb, model, cents, codes, (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
    )
    n1, n2 = batch1.count(), batch2.count()

    # recall@5 of batch1 vs the exact answer (full-probe on isotropic
    # data, so ADC ranking noise is the only gap; rerank recovers it)
    exact = brute_force_topk(emb, k=5, query_filter=F.col("vec_id") < 8)
    hits = batch1.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    recall = hits.count() / max(exact.count(), 1)

    return {
        "corpus": emb.count(),
        "codes": codes.count(),
        "batch1_results": n1,
        "batch2_results": n2,
        "recall_at_5": recall,
    }


if __name__ == "__main__":
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ann_index_example")
    out = run(spark, sf_dir)
    print(out)
    spark.stop()
