#!/usr/bin/env python
"""Fixed-batch-vs-growing-index scaling for the r10 Bloom-prefiltered
exact gate (dedup_exact_incremental_bloom) against the plain gate
(dedup_exact_incremental) — the production daily-ingest shape: the
batch is the sf0.1 documents table (5k docs, ~10% planted index dups),
the persisted index grows 1M → 3M → 10M fingerprints (synthetic
distinct md5s + the planted dups' real content fingerprints), both
index and bitmap read back from parquet like a real day-N run.

The claim under test: the plain gate's LEFT ANTI must shuffle the
whole index (the batch side is far under the broadcast bound, but
anti joins build on the RIGHT), so its wall time grows with the index;
the bloom gate touches the index only through one map-side scan probed
by a broadcast of the bloom-maybe set, so its wall time should grow
sub-linearly in the index. Bitmaps are sized at ~10-16 bits/element
(k=5, FP well under 1%) — the (m_bits, k) pair rides with each scale.

Protocol: the ab_pq_fit_r8 playbook — one session, warm both arms,
then interleave P/B/P/B/P/B per scale so drift hits both equally;
m3 per arm; admitted counts asserted equal every sample before any
timing is believed; per-scale load telemetry recorded.

Run: python tools/scale_bloom_r10.py [sf_dir]
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

from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)

OUT = "/tmp/spark_graft_scale_bloom_r10"

# index rows -> bitmap size: ~10-16 bits per element, power-of-two m
SCALES = {1_000_000: 1 << 24, 3_000_000: 1 << 25, 10_000_000: 1 << 27}
K = 5


def build(spark, sf_dir: str, n: int, m_bits: int) -> tuple[str, str]:
    """Persist (index parquet, bitmap parquet) for an n-fingerprint
    index: n synthetic distinct md5s plus the REAL content
    fingerprints of the batch's doc_id % 10 == 0 slice (the planted
    cross-dups the gate must drop)."""
    idx_path = f"{OUT}/index_{n}"
    bmp_path = f"{OUT}/bitmap_{n}"
    if not Path(idx_path).exists():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        planted = docs.filter(F.col("doc_id") % 10 == 0).select(
            tx.content_fingerprint(F.col("text")).alias("fingerprint")
        )
        synth = spark.range(n).select(
            F.md5(F.concat(F.lit("synthetic-"), F.col("id").cast("string"))).alias(
                "fingerprint"
            )
        )
        synth.unionAll(planted).write.mode("overwrite").parquet(idx_path)
    if not Path(bmp_path).exists():
        idx = spark.read.parquet(idx_path)
        dedup.bloom_bitmap(idx, m_bits=m_bits, k=K).write.mode(
            "overwrite"
        ).parquet(bmp_path)
    return idx_path, bmp_path


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="scale_bloom_r10")
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")

    results: dict[int, dict] = {}
    for n, m_bits in SCALES.items():
        idx_path, bmp_path = build(spark, sf_dir, n, m_bits)
        index = spark.read.parquet(idx_path)
        bitmap = spark.read.parquet(bmp_path)

        def run_plain() -> int:
            adm, _ = dedup.dedup_exact_incremental(batch, index)
            return adm.count()

        def run_bloom() -> int:
            adm, _, _ = dedup.dedup_exact_incremental_bloom(
                batch, index, bitmap, m_bits=m_bits, k=K
            )
            return adm.count()

        run_plain(), run_bloom()  # warm codegen for both arms
        plain_s, bloom_s = [], []
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            cp = run_plain()
            plain_s.append(time.perf_counter() - t0)
            gc.collect()
            t0 = time.perf_counter()
            cb = run_bloom()
            bloom_s.append(time.perf_counter() - t0)
            assert cp == cb, f"admitted mismatch at n={n}: {cp} != {cb}"
        b1, t1j = _cpu_busy()
        results[n] = {
            "plain_m3": round(statistics.median(plain_s), 3),
            "bloom_m3": round(statistics.median(bloom_s), 3),
            "plain": [round(s, 3) for s in plain_s],
            "bloom": [round(s, 3) for s in bloom_s],
            "admitted": cp,
            # r11: fill telemetry — the saturation gauge the daily
            # loop gets for free (one bit_count agg over the bitmap)
            "fill": round(dedup.bloom_fill_fraction(bitmap, m_bits), 3),
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"n={n}: {results[n]}", flush=True)

    print("\n| index rows | plain m3 | bloom m3 | bloom/plain | fill |")
    print("|---|---|---|---|---|")
    for n, r in results.items():
        print(
            f"| {n:,} | {r['plain_m3']} | {r['bloom_m3']} "
            f"| {r['bloom_m3'] / r['plain_m3']:.2f} | {r['fill']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
