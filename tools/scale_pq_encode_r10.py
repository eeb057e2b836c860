#!/usr/bin/env python
"""PQ ENCODE 1x/3x/10x scaling (r9 verdict item 6): fit is measured
flat (1.02x at 3x corpus, tools/ab_pq_fit_r8.py) and search flat at 3x
(ab_pq_search_r9.py); encode is the deliberately corpus-LINEAR stage —
this completes the scaling story with encode-only medians at 1x/3x/10x
replicas of sf0.1 embeddings.

Replica recipe: id-offset copies of the embeddings table (the
clone-free rotation trick scale_replicas_r9.py uses for TEXT is
unnecessary here — encode cost is per-row codegen arithmetic,
value-independent: each row pays the same m·k·sub_dim multiply-adds
whatever the vector holds, and no stage of encode compares rows).
The MODEL is fit once on the 1x corpus and reused at every scale, so
the timing isolates encode exactly.

Per scale: median-of-3 with load telemetry (the SCALE.md mover rule).

Run: python tools/scale_pq_encode_r10.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time
from functools import reduce
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/r10scale_pq"
ID_OFFSET = 10_000_000


def build(spark, mult: int) -> str:
    dest = f"{OUT}/x{mult}/embeddings.parquet"
    if os.path.exists(dest):
        return dest
    os.makedirs(f"{OUT}/x{mult}", exist_ok=True)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(v * ID_OFFSET)).alias("vec_id"),
            "embedding",
            "label",
        )
        for v in range(mult)
    ]
    reduce(lambda a, b: a.unionAll(b), parts).write.mode("overwrite").parquet(
        dest
    )
    return dest


def main() -> None:
    import gc

    from topn_clashroyal_etl_sql_snapshot_spark.operators import pq
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_pq_encode_r10")
    dirs = {m: build(spark, m) for m in (1, 3, 10)}
    for m, d in dirs.items():
        print(f"x{m}: {spark.read.parquet(d).count()} vectors", flush=True)

    base_emb = spark.read.parquet(dirs[1])
    model = pq.fit_pq_codebooks(
        base_emb, m=4, k=16, lloyd_rounds=2, sample_rows=1000
    )

    # warm codegen once
    def encode_once(path: str) -> None:
        emb = spark.read.parquet(path)
        # force real code materialization (sum of first code values);
        # a bare count() could prune the codes column
        pq.pq_encode(emb, model).select(
            F.sum(F.element_at("codes", 1))
        ).collect()

    encode_once(dirs[1])

    results: dict[int, dict] = {}
    for m in (1, 3, 10):
        samples = []
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            encode_once(dirs[m])
            samples.append(time.perf_counter() - t0)
        b1, t1j = _cpu_busy()
        results[m] = {
            "m3": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"pq_encode x{m}: {results[m]}", flush=True)

    print("\n| stage | 1x m3 | 3x m3 | 10x m3 | 3x ratio | 10x ratio |")
    print("|---|---|---|---|---|---|")
    print(
        f"| pq_encode | {results[1]['m3']} | {results[3]['m3']} "
        f"| {results[10]['m3']} | {results[3]['m3'] / results[1]['m3']:.2f} "
        f"| {results[10]['m3'] / results[1]['m3']:.2f} |"
    )
    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
