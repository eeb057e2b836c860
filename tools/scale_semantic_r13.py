#!/usr/bin/env python
"""Fixed-batch-vs-growing-index scaling for the r13
similarity.lsh_neardup_incremental (the production daily-ingest
shape): a constant 200-vector batch probes persisted sketch indexes
of 2k / 20k / 100k vectors. The claim under test: the day's cost
scales with |batch| + the index rows whose buckets the batch hits,
never the index scan — so wall time should grow far slower than the
index. The full-corpus lsh_neardup_pairs at the largest size is
measured alongside as the cost the incremental form avoids.

Vectors are generated Spark-side (xxhash64-derived uniforms — no
driver-side materialization), sketches are persisted to parquet and
read back, so the measured path is exactly the loop's: batch sketch +
bucket join + id-keyed verification against the vectors state.

Run: python tools/scale_semantic_r13.py
"""

from __future__ import annotations

import gc
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

OUT = "/tmp/scale_semantic_r13"
DIM = 64
BATCH = 200
PLANES, ROTS, THR = 16, 2, 0.9


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


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from topn_clashroyal_etl_sql_snapshot_spark.operators import similarity
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (
        cpu_busy as _cpu_busy,
    )

    spark = get_spark(app_name="scale_semantic_r13")
    shutil.rmtree(OUT, ignore_errors=True)

    batch = synth(spark, BATCH, id_offset=10_000_000).localCheckpoint(
        eager=True
    )
    sizes = (2_000, 20_000, 100_000)
    for n in sizes:
        index = synth(spark, n)
        index.write.mode("overwrite").parquet(f"{OUT}/vectors-{n}")
        similarity.hyperplane_sketches(
            index, PLANES, ROTS
        ).write.mode("overwrite").parquet(f"{OUT}/sketches-{n}")
        print(f"index {n}: persisted", flush=True)

    # warm codegen once (smallest index)
    pairs, _ = similarity.lsh_neardup_incremental(
        batch,
        spark.read.parquet(f"{OUT}/sketches-{sizes[0]}"),
        spark.read.parquet(f"{OUT}/vectors-{sizes[0]}"),
        threshold=THR,
        planes=PLANES,
        rotations=ROTS,
    )
    pairs.collect()

    results: dict[int, dict] = {}
    for n in sizes:
        sk = spark.read.parquet(f"{OUT}/sketches-{n}")
        vx = spark.read.parquet(f"{OUT}/vectors-{n}")
        samples = []
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            pairs, _ = similarity.lsh_neardup_incremental(
                batch, sk, vx, threshold=THR, planes=PLANES, rotations=ROTS
            )
            pairs.collect()
            samples.append(time.perf_counter() - t0)
        b1, t1j = _cpu_busy()
        results[n] = {
            "m3": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"incremental vs {n}-index: {results[n]}", flush=True)

    # the avoided cost: one full-corpus run at the largest size
    full_samples = []
    big = synth(spark, sizes[-1]).unionByName(batch)
    for _ in range(2):
        gc.collect()
        t0 = time.perf_counter()
        similarity.lsh_neardup_pairs(
            big, threshold=THR, planes=PLANES, rotations=ROTS
        ).collect()
        full_samples.append(time.perf_counter() - t0)
    full = round(min(full_samples), 3)
    print(f"full-corpus run at {sizes[-1] + BATCH}: {full}s", flush=True)

    r = results
    print(f"\n| shape | 2k | 20k | 100k | 100k/2k | full@100k |")
    print("|---|---|---|---|---|---|")
    print(
        f"| incremental ({BATCH}-batch) | {r[2000]['m3']} | {r[20000]['m3']} "
        f"| {r[100000]['m3']} | {r[100000]['m3'] / r[2000]['m3']:.2f}x "
        f"| {full} |"
    )
    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
