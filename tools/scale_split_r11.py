#!/usr/bin/env python
"""split_by_component at CRAWL duplicate shares (r10 verdict ask #2).

The operator's r10 docstring claimed the labels frame is "small
relative to the corpus and AQE broadcasts it — the corpus never
shuffles". That is true at benchmark duplicate shares (a few % of
docs in near-dup clusters) and FALSE at web-crawl shares, where
30-50% of documents sit in some cluster and the labels frame is
corpus-order — over any sane broadcast bound, so the join degrades to
a key-partitioned shuffle. This harness measures both regimes and
records what the plan actually does:

- dup_share=0.50 (crawl): labels = half the corpus. Expect a shuffle
  (SortMergeJoin/ShuffledHashJoin) at every scale — scale-SAFE (two
  key exchanges), but the corpus DOES shuffle.
- dup_share=0.01 (curated): labels tiny. Expect AQE to broadcast —
  the corpus never shuffles.

Corpus: n rows of (doc_id, 32-char payload) written to parquet and
read back (real scan, not an in-memory range); labels pair up the
first dup_share·n ids (cluster size 2 — the worst case for label
VOLUME: maximum labels rows per clustered doc). 1×/3×/10× at the
crawl share; single scale at the curated share (the broadcast claim
needs one witness, not a slope). m3 per point, interleaved warm,
action = groupBy(split).count() so the split column is actually
computed for every row.

Run: python tools/scale_split_r11.py
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)

OUT = "/tmp/spark_graft_scale_split_r11"
BASE_N = 2_000_000


def build(spark, n: int, dup_share: float) -> tuple[str, str]:
    tag = f"{n}_{int(dup_share * 100)}"
    docs_path, lab_path = f"{OUT}/docs_{tag}", f"{OUT}/labels_{tag}"
    if not Path(docs_path).exists():
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
            .write.mode("overwrite")
            .parquet(docs_path)
        )
    if not Path(lab_path).exists():
        n_clustered = int(n * dup_share)
        (
            spark.range(n_clustered)
            .select(
                F.col("id").alias("id"),
                # pair clusters: comp = even member's id
                (F.col("id") - (F.col("id") % 2)).alias("comp"),
            )
            .write.mode("overwrite")
            .parquet(lab_path)
        )
    return docs_path, lab_path


def run_point(spark, n: int, dup_share: float) -> dict:
    docs_path, lab_path = build(spark, n, dup_share)
    docs = spark.read.parquet(docs_path)
    labels = spark.read.parquet(lab_path)

    def run():
        out = sampling.split_by_component(docs, labels)
        agg = out.groupBy("split").count()
        rows = {r["split"]: r["count"] for r in agg.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
        return rows, plan

    run()  # warm
    samples = []
    l0 = os.getloadavg()[0]
    b0, t0j = _cpu_busy()
    for _ in range(3):
        gc.collect()
        t0 = time.perf_counter()
        rows, plan = run()
        samples.append(time.perf_counter() - t0)
    b1, t1j = _cpu_busy()
    join_kind = (
        "broadcast"
        if "BroadcastHashJoin" in plan
        else "shuffle"
        if ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)
        else "other"
    )
    assert sum(rows.values()) == n, rows
    return {
        "n": n,
        "dup_share": dup_share,
        "m3": round(statistics.median(samples), 3),
        "samples": [round(s, 3) for s in samples],
        "join": join_kind,
        "splits": rows,
        "load1": round(l0, 2),
        "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
    }


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_split_r11")
    results = []
    # crawl share: the 1x/3x/10x slope
    for mult in (1, 3, 10):
        r = run_point(spark, BASE_N * mult, 0.50)
        results.append(r)
        print(f"crawl {mult}x: {r}", flush=True)
    # curated share: one witness for the broadcast regime
    r = run_point(spark, BASE_N, 0.01)
    results.append(r)
    print(f"curated 1x: {r}", flush=True)

    print("\n| rows | dup share | join | m3 (s) |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['n']:,} | {int(r['dup_share'] * 100)}% "
            f"| {r['join']} | {r['m3']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
