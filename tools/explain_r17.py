#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for every declared query (and the
bench-only extras) into plans/r17/<name>_<tag>.txt.

Usage: python tools/explain_r17.py <tag> [name ...]

With no names, captures every registered query plus the bench extras.
Plan capture is driver-side compilation, so the files witness plan
shape (Exchange count, join strategy, PushedFilters, ReadSchema), not
timing — but note (r17 advisor) that building a component-consumer
query DOES execute jobs at capture time: the shared jaccard-pairs
cache materializes its eager localCheckpoint and the CC fast path runs
its bounded collect while the plan is being constructed.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.plans import (  # noqa: F401
        domain_queries,
        llm_queries,
        testdata_queries,
    )

    out_dir = _REPO / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)

    # full field lists in the captured plans — the default truncates
    # wide Projects to "... N more fields", hiding exactly the column
    # flow a plan audit checks
    spark = get_spark(
        app_name="explain_r17",
        extra_conf={"spark.sql.debug.maxToStringFields": "2000"},
    )

    qs = dict(testdata_queries.queries())
    # bench-only extras (same set bench.py times)
    extras = {
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
    qs.update(extras)
    if only:
        qs = {n: f for n, f in qs.items() if n in only}

    failed: list[str] = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (out_dir / f"{name}_{tag}.txt").write_text(plan)
            print(f"ok  {name}")
        except Exception as exc:  # noqa: BLE001 — capture harness
            failed.append(name)
            print(f"ERR {name}: {type(exc).__name__}: {exc}")
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
