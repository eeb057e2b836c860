#!/usr/bin/env python
"""Per-entry cost split for the bench's expensive queries (guide §1):
for each named entry, after one warm-up run, time
  - build_sec: the query function call (driver-side plan construction,
    including any eager checkpoints/fits the entry runs while building)
  - exec_sec:  the terminal .collect()
and count the Spark jobs each phase launched (statusTracker delta).
A high build_sec or a high job count with low per-job work marks a
fixed-cost (scheduling/planning) target; a high exec_sec marks real
compute.

Usage: python tools/profile_bench_r16.py entry [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.plans import (  # noqa: F401
        domain_queries,
        llm_queries,
        testdata_queries,
    )

    spark = get_spark(app_name="profile_bench_r16")
    qs = dict(testdata_queries.queries())
    qs.update(
        {
            "embedding_lsh_neardup": llm_queries.embedding_lsh_neardup,
            "q1_pricing_summary": testdata_queries.q1_pricing_summary,
            "embedding_pq_topk": llm_queries.embedding_pq_topk,
            "docs_corpus_profile": llm_queries.docs_corpus_profile,
            "approx_distinct_sketch": testdata_queries.approx_distinct_sketch,
            "text_token_stats": llm_queries.text_token_stats,
            "dedup_exact_summary": llm_queries.dedup_exact_summary,
            "docs_term_quality": llm_queries.docs_term_quality,
            "text_winnow_fingerprints": llm_queries.text_winnow_fingerprints,
            "events_rolling_sum": testdata_queries.events_rolling_sum,
            "docs_with_split": llm_queries.docs_with_split,
            "setops_suite": testdata_queries.setops_suite,
            "chunk_by_chars": llm_queries.chunk_by_chars,
            "dedup_components": llm_queries.dedup_components,
            "docs_pack_greedy": llm_queries.docs_pack_greedy,
            "text_language_id": llm_queries.text_language_id,
        }
    )
    tracker = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        fn = qs[name]
        # warm-up: codegen/JIT + parquet footer cache, same policy as bench.py
        fn(spark, sf_dir).collect()
        runs = []
        for _ in range(3):
            import gc

            gc.collect()
            if name == "curation_funnel":
                llm_queries._PAIRS_CACHE.pop(spark, None)
                llm_queries._TOKS_CACHE.pop(spark, None)
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None))
            df.collect()
            t2 = time.perf_counter()
            j2 = len(tracker.getJobIdsForGroup(None))
            runs.append(
                {
                    "build_sec": round(t1 - t0, 3),
                    "exec_sec": round(t2 - t1, 3),
                    "build_jobs": j1 - j0,
                    "exec_jobs": j2 - j1,
                }
            )
        out[name] = runs
        print(name, json.dumps(runs), flush=True)
    spark.stop()
    print("PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main()
