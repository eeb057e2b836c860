#!/usr/bin/env python
"""connected_components_incremental vs a full-history rerun as the
persisted labels grow 1x/3x/10x with a FIXED daily batch (r11) — the
scale claim under test: the incremental merge touches the labels frame
only through two map-side broadcast-probed scans (no exchange of the
persisted frame, plan-pinned in tests/test_dedup.py), so its cost
grows only with the labels SCAN, while the honest alternative — a full
CC rerun over history ∪ batch, here given the maximal benefit of the
doubt by replacing history with its equivalent star edges — re-shuffles
the history-sized edge list once per propagation round.

Setup per scale: labels = n rows ((id, comp), pair components) written
to parquet and read back; history star edges for the full arm derive
from the same frame (id—comp). Batch = 5,000 pairs, fixed at every
scale: 40% bridge two existing components, 40% attach a new doc to an
existing component, 20% connect brand-new ids. Both arms produce the
same merged labeling (asserted on a sampled key set each run before
timings are believed). Interleaved I/F m3, action = count() on the
updated labels.

Run: python tools/scale_cc_incr_r11.py
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

OUT = "/tmp/spark_graft_scale_cc_incr_r11"
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


def build_batch(spark, n: int):
    """Fixed-size batch over an n-row id space: bridges, attachments,
    brand-new pairs — deterministic (derived from spark.range)."""
    k = BATCH
    bridges = spark.range(k * 4 // 10).select(
        (F.col("id") * 4).alias("id1"),            # comp roots (even)
        (F.col("id") * 4 + 2).alias("id2"),        # neighbor comp root
    )
    attach = spark.range(k * 4 // 10).select(
        (F.col("id") * 4 + 1).alias("id1"),        # existing odd member
        (F.lit(n) + F.col("id")).alias("id2"),     # new doc
    )
    fresh = spark.range(k * 2 // 10).select(
        (F.lit(n) + F.lit(10_000_000) + F.col("id") * 2).alias("id1"),
        (F.lit(n) + F.lit(10_000_000) + F.col("id") * 2 + 1).alias("id2"),
    )
    return bridges.unionAll(attach).unionAll(fresh)


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_cc_incr_r11")
    results = {}
    for mult in (1, 3, 10):
        n = BASE_N * mult
        labels = spark.read.parquet(build_labels(spark, n))
        batch = build_batch(spark, n).localCheckpoint(eager=True)

        def run_incr() -> int:
            return dedup.connected_components_incremental(
                labels, batch
            ).count()

        def run_full() -> int:
            star = labels.select(
                F.col("id").alias("id1"), F.col("comp").alias("id2")
            )
            return dedup.connected_components(star.unionAll(batch)).count()

        # equivalence spot-check on the touched keys before timing
        probe = [0, 1, 2, 3, n, n + 1, n + 10_000_000]
        gi = {
            r["id"]: r["comp"]
            for r in dedup.connected_components_incremental(labels, batch)
            .filter(F.col("id").isin(probe)).collect()
        }
        gf = {
            r["id"]: r["comp"]
            for r in dedup.connected_components(
                labels.select(
                    F.col("id").alias("id1"), F.col("comp").alias("id2")
                ).unionAll(batch)
            ).filter(F.col("id").isin(probe)).collect()
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
            "rows_out": ci,
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"x{mult}: {results[mult]}", flush=True)

    print("\n| labels | incr m3 | full-rerun m3 | speedup |")
    print("|---|---|---|---|")
    for m, r in results.items():
        print(
            f"| {r['labels']:,} | {r['incr_m3']} | {r['full_m3']} "
            f"| {r['full_m3'] / r['incr_m3']:.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
