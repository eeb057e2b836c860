#!/usr/bin/env python
"""Fixed-batch-vs-growing-history scaling for the r10 incremental line
gate (dedup_lines_incremental) against a FULL-corpus rerun
(dedup_lines_corpus over history ∪ batch) — the daily-ingest cost the
operator exists to remove: the full run re-explodes and re-shuffles
every line ever crawled to admit one day's batch; the incremental gate
explodes the batch only and joins a persisted 16-byte-per-line key
index.

History = scale_replicas_r9's clone-free replica corpora (1x/3x/10x of
sf0.1 documents, batch docs excluded); batch = the original corpus's
doc_id % 10 == 0 slice (~500 docs, whose lines DO exist in the index —
the dup paths fire). Day-0 index construction is not timed on either
arm (it is the one-off backfill); the timed work is what a day-N run
pays. Both arms materialize with .count() over the SAME output shape
(the batch's cleaned rows — the full arm filters to batch ids), and
the batch-row results are asserted identical every sample before any
timing is believed (the incremental gate's monotone-id identity).

Protocol: ab_pq_fit_r8 playbook — warm both arms, interleave F/I per
scale, m3 per arm, per-scale load telemetry.

Run: python tools/scale_lines_r10.py
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

from tools.scale_replicas_r9 import ID_OFFSET, OUT, build  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)


def _line_index(spark, corpus, path: str):
    if not Path(path).exists():
        (
            corpus.select(
                F.posexplode(
                    F.split(F.regexp_replace("text", "\r\n", "\n"), "\n")
                ).alias("idx", "line")
            )
            .filter(F.length(F.trim("line")) >= 10)
            .select(
                F.xxhash64("line").alias("h"),
                F.xxhash64(F.lit(1).cast("long"), F.col("line")).alias("h2"),
            )
            .distinct()
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_lines_r10")
    ms = [int(x) for x in sys.argv[1:]] or [1, 3, 10]
    dirs = {m: build(spark, m) for m in ms}

    is_batch = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < ID_OFFSET)
    batch = (
        spark.read.parquet(f"{dirs[1]}/documents.parquet")
        .filter(is_batch)
        .localCheckpoint(eager=True)
    )

    results: dict[int, dict] = {}
    for m in ms:
        docs = spark.read.parquet(f"{dirs[m]}/documents.parquet")
        corpus = docs.filter(~is_batch)
        index = _line_index(spark, corpus, f"{OUT}/x{m}/line_index.parquet")

        def run_full() -> list:
            out = dedup.dedup_lines_corpus(corpus.unionAll(batch))
            return sorted(map(tuple, out.filter(is_batch).collect()))

        def run_incr() -> list:
            cleaned, _ = dedup.dedup_lines_incremental(batch, index)
            return sorted(map(tuple, cleaned.collect()))

        run_full(), run_incr()  # warm codegen
        full_s, incr_s = [], []
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            rf = run_full()
            full_s.append(time.perf_counter() - t0)
            gc.collect()
            t0 = time.perf_counter()
            ri = run_incr()
            incr_s.append(time.perf_counter() - t0)
            assert rf == ri, f"batch-row mismatch at x{m}"
        b1, t1j = _cpu_busy()
        results[m] = {
            "full_m3": round(statistics.median(full_s), 3),
            "incr_m3": round(statistics.median(incr_s), 3),
            "full": [round(s, 3) for s in full_s],
            "incr": [round(s, 3) for s in incr_s],
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"x{m}: {results[m]}", flush=True)

    print("\n| history | full-rerun m3 | incremental m3 | incr/full |")
    print("|---|---|---|---|")
    for m, r in results.items():
        print(
            f"| x{m} | {r['full_m3']} | {r['incr_m3']} "
            f"| {r['incr_m3'] / r['full_m3']:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
