#!/usr/bin/env python
"""component_keepers_incremental vs a full corpus-wide re-pick as the
persisted labels/keepers grow 1x/3x/10x with a FIXED daily batch (r12)
— the scale claim under test: the incremental recompute touches the
two persisted frames (labels, keepers) only through broadcast-probed
map-side scans and re-picks champions only inside batch-touched
components, so its cost grows only with the persisted-frame SCAN,
while the honest alternative — ``component_keepers`` over the full
updated labels — re-shuffles the corpus-sized labels AND scores frames
on every ingest day.

Setup per scale: labels = n rows (pair components, written to parquet
and read back), keepers = the full day-0 ``component_keepers`` over a
deterministic per-id score frame (also parquet). Batch = the
scale_cc_incr_r11 recipe (5,000 pairs: 40% bridges, 40% attachments,
20% brand-new). Both arms run against the SAME updated labels
(``connected_components_incremental``, checkpointed off the clock) and
their keep sets are asserted equal on a sampled key set each run
before timings are believed. Interleaved I/F m3; action = count() of
keep=true rows.

Run: python tools/scale_keepers_r12.py
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

from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)

OUT = "/tmp/spark_graft_scale_keepers_r12"
BASE_N = 2_000_000
BATCH = 5_000


def build_labels(spark, n: int) -> str:
    path = f"{OUT}/labels_{n}"
    if not Path(path).exists():
        (
            spark.range(n)
            .select(
                F.col("id"),
                (F.col("id") - (F.col("id") % 2)).alias("comp"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def scores_for(spark, n: int):
    # deterministic per-id score covering history AND any batch id the
    # recipe can mint (new docs at n.., fresh pairs at n+10M..)
    return spark.range(n + 10_000_000 + BATCH).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("score")
    )


def build_keepers(spark, n: int, labels) -> str:
    path = f"{OUT}/keepers_{n}"
    if not Path(path).exists():
        dedup.component_keepers(labels, scores_for(spark, n)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def build_batch(spark, n: int):
    k = BATCH
    bridges = spark.range(k * 4 // 10).select(
        (F.col("id") * 4).alias("id1"),
        (F.col("id") * 4 + 2).alias("id2"),
    )
    attach = spark.range(k * 4 // 10).select(
        (F.col("id") * 4 + 1).alias("id1"),
        (F.lit(n) + F.col("id")).alias("id2"),
    )
    fresh = spark.range(k * 2 // 10).select(
        (F.lit(n) + F.lit(10_000_000) + F.col("id") * 2).alias("id1"),
        (F.lit(n) + F.lit(10_000_000) + F.col("id") * 2 + 1).alias("id2"),
    )
    return bridges.unionAll(attach).unionAll(fresh)


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_keepers_r12")
    results = {}
    for mult in (1, 3, 10):
        n = BASE_N * mult
        labels = spark.read.parquet(build_labels(spark, n))
        keepers = spark.read.parquet(build_keepers(spark, n, labels))
        scores = scores_for(spark, n)
        batch = build_batch(spark, n).localCheckpoint(eager=True)
        # both arms consume the SAME updated labels, built off the clock
        updated = dedup.connected_components_incremental(
            labels, batch
        ).localCheckpoint(eager=True)

        def run_incr() -> int:
            return (
                dedup.component_keepers_incremental(
                    updated, keepers, batch, scores
                )
                .filter(F.col("keep"))
                .count()
            )

        def run_full() -> int:
            return (
                dedup.component_keepers(updated, scores)
                .filter(F.col("keep"))
                .count()
            )

        # equivalence spot-check on touched + untouched keys
        probe = [0, 1, 2, 3, 100_001, n, n + 1, n + 10_000_000]
        gi = {
            r["id"]: (r["comp"], r["keep"])
            for r in dedup.component_keepers_incremental(
                updated, keepers, batch, scores
            ).filter(F.col("id").isin(probe)).collect()
        }
        gf = {
            r["id"]: (r["comp"], r["keep"])
            for r in dedup.component_keepers(updated, scores)
            .filter(F.col("id").isin(probe)).collect()
        }
        assert gi == gf, (mult, gi, gf)

        run_incr(), run_full()  # warm
        incr_s, full_s = [], []
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            ci = run_incr()
            incr_s.append(time.perf_counter() - t0)
            gc.collect()
            t0 = time.perf_counter()
            cf = run_full()
            full_s.append(time.perf_counter() - t0)
            assert ci == cf, (mult, ci, cf)
        b1, t1j = _cpu_busy()
        results[mult] = {
            "labels": n,
            "incr_m3": round(statistics.median(incr_s), 3),
            "full_m3": round(statistics.median(full_s), 3),
            "incr": [round(s, 3) for s in incr_s],
            "full": [round(s, 3) for s in full_s],
            "keep_true": ci,
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"x{mult}: {results[mult]}", flush=True)

    print("\n| labels | incr m3 | full re-pick m3 | speedup |")
    print("|---|---|---|---|")
    for m, r in results.items():
        print(
            f"| {r['labels']:,} | {r['incr_m3']} | {r['full_m3']} "
            f"| {r['full_m3'] / r['incr_m3']:.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
