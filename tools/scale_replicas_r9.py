#!/usr/bin/env python
"""10x replica scaling for the shuffle-heavy dedup families (r8
verdict item 7): dedup_minhash_lsh, docs_exact_substring,
dedup_simhash at 1x / 3x / 10x documents.

Clone-free recipe (the r7/r8 discipline, extended): replica v applies
a BIJECTIVE per-variant character rotation over [a-z0-9] to the text
(F.translate — JVM-side), plus an id offset. Each variant preserves
the corpus's statistical shape exactly (token lengths, doc lengths,
within-variant dup structure all isomorphic to the original) while
variant vocabularies are pairwise DISJOINT — no artificial cross-copy
near-duplicate pairs, so candidate generation scales with the honest
corpus term, not a planted quadratic. v=0 is the identity (1x ==
sf0.1 documents exactly).

Per entry per scale: median-of-3, tokenize/pairs caches evicted per
run so every repeat pays full compute, load telemetry recorded.

Run: python tools/scale_replicas_r9.py
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

from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (
    cpu_busy as _cpu_busy,
)

from pyspark.sql import functions as F  # noqa: E402

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
BASE = "/root/testdata/sf0.1"
OUT = "/tmp/r9scale"
ID_OFFSET = 10_000_000




def build(spark, mult: int) -> str:
    out_dir = f"{OUT}/x{mult}"
    dest = f"{out_dir}/documents.parquet"
    if os.path.exists(dest):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for v in range(mult):
        shifted = ALPHABET[v:] + ALPHABET[:v]
        # translate is case-carrying for untouched chars (whitespace,
        # punctuation, uppercase) — structure preserved verbatim
        txt = (
            F.col("text")
            if v == 0
            else F.translate(F.col("text"), ALPHABET, shifted)
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(v * ID_OFFSET)).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    from functools import reduce

    reduce(lambda a, b: a.unionAll(b), parts).write.mode(
        "overwrite"
    ).parquet(dest)
    return out_dir


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.plans import llm_queries
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_replicas_r9")
    dirs = {m: build(spark, m) for m in (1, 3, 10)}
    for m, d in dirs.items():
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"x{m}: {n} docs at {d}", flush=True)

    entries = {
        "dedup_minhash_lsh": llm_queries.dedup_minhash_lsh,
        "docs_exact_substring": llm_queries.docs_exact_substring,
        "dedup_simhash": llm_queries.dedup_simhash,
    }
    import gc

    # warm codegen once on the smallest scale
    for fn in entries.values():
        fn(spark, dirs[1]).collect()

    results: dict[str, dict[int, dict]] = {}
    for name, fn in entries.items():
        results[name] = {}
        for m in (1, 3, 10):
            samples = []
            l0 = os.getloadavg()[0]
            b0, t0j = _cpu_busy()
            for _ in range(3):
                gc.collect()
                llm_queries._TOKS_CACHE.pop(spark, None)
                llm_queries._PAIRS_CACHE.pop(spark, None)
                t0 = time.perf_counter()
                fn(spark, dirs[m]).collect()
                samples.append(time.perf_counter() - t0)
            b1, t1j = _cpu_busy()
            results[name][m] = {
                "m3": round(statistics.median(samples), 3),
                "samples": [round(s, 3) for s in samples],
                "load1": round(l0, 2),
                "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
            }
            print(f"{name} x{m}: {results[name][m]}", flush=True)

    print("\n| query | 1x m3 | 3x m3 | 10x m3 | 3x ratio | 10x ratio |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r[1]['m3']} | {r[3]['m3']} | {r[10]['m3']} "
            f"| {r[3]['m3'] / r[1]['m3']:.2f} | {r[10]['m3'] / r[1]['m3']:.2f} |"
        )
    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
