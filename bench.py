#!/usr/bin/env python
"""Benchmark harness: runs the registered query surface at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.plans import (  # noqa: F401
        domain_queries,
        llm_queries,
        testdata_queries,
    )

    spark = get_spark(app_name="bench")

    qs = testdata_queries.queries()

    # Headline = the scalable plans. The O(n²) exact ground-truth
    # variants (kept registered for the sf0.01 correctness gate) are
    # excluded from timing: their role is verifying the sub-quadratic
    # paths, not being the path.
    # cr_* run on a fixed-size domain fixture (sf-independent pipeline
    # parity checks) — timing them against sf would be meaningless.
    excluded = {"embedding_neardup_pairs"}
    qs = {
        n: f
        for n, f in qs.items()
        if n not in excluded and not n.startswith("cr_")
    }

    # Warm the JVM/codegen path once so per-query timings measure the
    # queries, not first-call JIT + parquet footer reads.
    next(iter(qs.values()))(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
