#!/usr/bin/env python
"""r17 A/B (r16 verdict #5): decide the AQE SMJ→SHJ runtime rewrite
(`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`, guide §3.1)
on the SMJ-heavy entries in ONE session with the conf toggled per
sample — the cleanest interleaving possible (both arms share the same
JVM, codegen cache, and box minute). The r16 A/Bs were two separate
session campaigns and disagreed; this design removes the
cross-session variance that contaminated them. Steal fraction is
bracketed per sample so the receipt shows whether the window was
idle."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

ENTRIES = [
    "dedup_minhash_incremental",
    "dedup_minhash_lsh",
    "lm_perplexity",
    "docs_classifier_margin",
]
ROUNDS = 6
THRESHOLD = "64m"


def steal():
    parts = open("/proc/stat").readline().split()
    v = [int(x) for x in parts[1:9]]
    return v[7], sum(v)


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.plans import llm_queries

    spark = get_spark(app_name="ab_shj_r17")
    sf = "/root/testdata/sf0.1"
    conf = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
    qs = {n: getattr(llm_queries, n) for n in ENTRIES}

    import gc

    for name, fn in qs.items():
        fn(spark, sf).collect()  # warm
        off_t, on_t, steals = [], [], []
        for r in range(ROUNDS):
            arms = (
                [("0", off_t), (THRESHOLD, on_t)]
                if r % 2 == 0
                else [(THRESHOLD, on_t), ("0", off_t)]
            )
            for val, acc in arms:
                gc.collect()
                spark.conf.set(conf, val)
                s0, t0c = steal()
                t0 = time.perf_counter()
                fn(spark, sf).collect()
                acc.append(time.perf_counter() - t0)
                s1, t1c = steal()
                steals.append(round(100 * (s1 - s0) / max(t1c - t0c, 1), 1))
        spark.conf.set(conf, "0")
        print(
            f"{name}: off med {statistics.median(off_t):.2f} "
            f"on med {statistics.median(on_t):.2f}  "
            f"off {[round(x, 2) for x in off_t]} "
            f"on {[round(x, 2) for x in on_t]} steal% {steals}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
