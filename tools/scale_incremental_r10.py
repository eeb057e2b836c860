#!/usr/bin/env python
"""1x/3x/10x scaling for the r10-registered dedup_minhash_incremental
plan (the convention: every newly registered heavyweight gets a
replica-scaling datapoint). Reuses scale_replicas_r9's clone-free
corpus builder (bijective per-variant character rotation — disjoint
vocabularies, no artificial cross-copy near-dups), so the measured
growth is the honest corpus term.

Note the registered plan splits the SAME corpus 10%/90% into
batch/index, so corpus replicas scale BOTH sides together — this
measures the full-reindex shape. The fixed-batch-vs-growing-index
shape (the production daily-ingest cost) was measured r9 at 1.19x
wall for a 10x index (SCALE.md).

Run: python tools/scale_incremental_r10.py
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from tools.scale_replicas_r9 import OUT, build  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)


def main() -> None:
    import gc

    from topn_clashroyal_etl_sql_snapshot_spark.plans import llm_queries
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_incremental_r10")
    dirs = {m: build(spark, m) for m in (1, 3, 10)}
    for m, d in dirs.items():
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"x{m}: {n} docs at {d}", flush=True)

    fn = llm_queries.dedup_minhash_incremental
    fn(spark, dirs[1]).collect()  # warm codegen

    results: dict[int, dict] = {}
    for m in (1, 3, 10):
        samples = []
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            llm_queries._TOKS_CACHE.pop(spark, None)
            t0 = time.perf_counter()
            fn(spark, dirs[m]).collect()
            samples.append(time.perf_counter() - t0)
        b1, t1j = _cpu_busy()
        results[m] = {
            "m3": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"dedup_minhash_incremental x{m}: {results[m]}", flush=True)

    print("\n| query | 1x m3 | 3x m3 | 10x m3 | 3x ratio | 10x ratio |")
    print("|---|---|---|---|---|---|")
    print(
        f"| dedup_minhash_incremental | {results[1]['m3']} | {results[3]['m3']} "
        f"| {results[10]['m3']} | {results[3]['m3'] / results[1]['m3']:.2f} "
        f"| {results[10]['m3'] / results[1]['m3']:.2f} |"
    )
    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
