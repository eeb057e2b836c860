#!/usr/bin/env python
"""Idle-box median-of-3 measurement for named bench entries — the
referee harness the repo's bench-honesty rule (SCALE.md r10) calls
for: same session shape, warm-up, gc + cache hygiene as bench.py,
but only the entries under adjudication, so a reading exists that a
fresh same-box run can reproduce without paying a full bench.

Usage: python tools/m3_entries.py dedup_simhash dedup_minhash_lsh ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_M3_N   (default 3 samples per entry)

Prints one JSON line per entry: {"entry": ..., "m3": ..., "samples":
[...], "load1": ...} and a final {"total": ...} line.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: m3_entries.py ENTRY [ENTRY ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_samples = int(os.environ.get("SPARK_GRAFT_M3_N", "3"))

    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.plans import (  # noqa: F401
        domain_queries,
        llm_queries,
        testdata_queries,
    )

    spark = get_spark(app_name="m3_entries")
    qs = testdata_queries.queries()
    # bench-only entries reachable by attribute, mirroring bench.py
    for extra in names:
        if extra not in qs:
            for mod in (llm_queries, testdata_queries):
                fn = getattr(mod, extra, None)
                if callable(fn):
                    qs[extra] = fn
                    break

    # validate EVERY name before timing anything: a typo'd first
    # entry would silently skip the JVM warm-up (its cost then lands
    # on the first timed entry — inflating exactly the referee
    # reading this harness exists to make reproducible) and a later
    # unknown name would crash after partial output (r13 review
    # finding)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(
            f"unknown entries: {', '.join(unknown)} — not in queries() "
            "or reachable as a bench-only callable",
            file=sys.stderr,
        )
        sys.exit(2)

    import statistics

    # warm the JVM once on the first requested entry (uncounted)
    qs[names[0]](spark, sf_dir).collect()

    total = 0.0
    for name in names:
        fn = qs[name]
        samples = []
        load1 = os.getloadavg()[0]
        for _ in range(n_samples):
            gc.collect()
            if name == "curation_funnel":
                llm_queries._PAIRS_CACHE.pop(spark, None)
                llm_queries._TOKS_CACHE.pop(spark, None)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        m3 = round(statistics.median(samples), 4)
        total += m3
        print(json.dumps({"entry": name, "m3": m3, "samples": samples,
                          "load1": round(load1, 2)}), flush=True)
    print(json.dumps({"total": round(total, 4)}))


if __name__ == "__main__":
    main()
