#!/usr/bin/env python
"""r14 idle re-measurement of the semantic-incremental scale table
(r13 verdict, next #2): the r13 readings (tools/scale_semantic_r13.py)
were taken under residual load1 7-9, and the harness fixed the batch
at 200 — so the 1.37x growth claim covered only the growing-INDEX
axis, under load. This harness measures BOTH growth directions on an
idle box:

- axis A (r13's): a fixed 200-vector batch vs persisted indexes of
  2k / 20k / 100k vectors — the index-growth curve;
- axis B (new): batches of 200 / 1k / 5k vectors vs a FIXED 20k-vector
  persisted index — the batch-growth curve. The claim under test:
  cost scales ~linearly in |batch| (each batch row sketches once and
  probes its own buckets), so 25x batch should cost far less than 25x
  (shared per-job overhead amortizes) and never more.

Same synthetic xxhash64-derived vectors, persisted-parquet index, and
median-of-3 + load1/cpu_busy telemetry as the r13 harness — a fresh
same-box run reproduces the table by command.

Run idle: python tools/scale_semantic_r14.py
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

OUT = "/tmp/scale_semantic_r14"
DIM = 64
PLANES, ROTS, THR = 16, 2, 0.9
INDEX_SIZES = (2_000, 20_000, 100_000)
BATCH_SIZES = (200, 1_000, 5_000)
FIXED_INDEX = 20_000


def synth(spark, n: int, id_offset: int = 0):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select((F.col("id") + id_offset).alias("vec_id"))
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: (
                    F.xxhash64(F.col("vec_id"), d).cast("double")
                    / F.lit(float(1 << 63))
                ).cast("float"),
            ).alias("embedding"),
        )
    )


def _measure(spark, similarity, batch, sk, vx, n_samples=3):
    from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (
        cpu_busy as _cpu_busy,
    )

    samples = []
    l0 = os.getloadavg()[0]
    b0, t0j = _cpu_busy()
    for _ in range(n_samples):
        gc.collect()
        t0 = time.perf_counter()
        pairs, _ = similarity.lsh_neardup_incremental(
            batch, sk, vx, threshold=THR, planes=PLANES, rotations=ROTS
        )
        pairs.collect()
        samples.append(time.perf_counter() - t0)
    b1, t1j = _cpu_busy()
    return {
        "m3": round(statistics.median(samples), 3),
        "samples": [round(s, 3) for s in samples],
        "load1": round(l0, 2),
        "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
    }


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.operators import similarity
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_semantic_r14")
    shutil.rmtree(OUT, ignore_errors=True)

    for n in INDEX_SIZES:
        index = synth(spark, n)
        index.write.mode("overwrite").parquet(f"{OUT}/vectors-{n}")
        similarity.hyperplane_sketches(
            index, PLANES, ROTS
        ).write.mode("overwrite").parquet(f"{OUT}/sketches-{n}")
        print(f"index {n}: persisted", flush=True)

    batches = {
        b: synth(spark, b, id_offset=10_000_000).localCheckpoint(eager=True)
        for b in BATCH_SIZES
    }

    # warm codegen once (smallest of each)
    pairs, _ = similarity.lsh_neardup_incremental(
        batches[BATCH_SIZES[0]],
        spark.read.parquet(f"{OUT}/sketches-{INDEX_SIZES[0]}"),
        spark.read.parquet(f"{OUT}/vectors-{INDEX_SIZES[0]}"),
        threshold=THR,
        planes=PLANES,
        rotations=ROTS,
    )
    pairs.collect()

    axis_a: dict[int, dict] = {}
    for n in INDEX_SIZES:
        sk = spark.read.parquet(f"{OUT}/sketches-{n}")
        vx = spark.read.parquet(f"{OUT}/vectors-{n}")
        axis_a[n] = _measure(spark, similarity, batches[200], sk, vx)
        print(json.dumps({"axis": "index", "index": n, **axis_a[n]}),
              flush=True)

    axis_b: dict[int, dict] = {}
    sk = spark.read.parquet(f"{OUT}/sketches-{FIXED_INDEX}")
    vx = spark.read.parquet(f"{OUT}/vectors-{FIXED_INDEX}")
    for b in BATCH_SIZES:
        axis_b[b] = _measure(spark, similarity, batches[b], sk, vx)
        print(json.dumps({"axis": "batch", "batch": b, **axis_b[b]}),
              flush=True)

    a, bt = axis_a, axis_b
    print("\n| axis | m3 (s) | growth |")
    print("|---|---|---|")
    print(
        f"| index 2k/20k/100k (batch 200) | {a[2000]['m3']} / "
        f"{a[20000]['m3']} / {a[100000]['m3']} | "
        f"{a[100000]['m3'] / a[2000]['m3']:.2f}x at 50x index |"
    )
    print(
        f"| batch 200/1k/5k (index 20k) | {bt[200]['m3']} / "
        f"{bt[1000]['m3']} / {bt[5000]['m3']} | "
        f"{bt[5000]['m3'] / bt[200]['m3']:.2f}x at 25x batch |"
    )
    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
