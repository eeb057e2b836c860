#!/usr/bin/env python
"""Same-session A/B/C: connected_components in its r10 hybrid default
(plain rounds, pointer jumping from round jump_start=2), the
always-jump form (jump_start=0), and the r9 plain
min-label-propagation form — the honesty measurement for the r10
O(log n) rework. The jump adds one key-partitioned self-join per
round; on the tight driver-corpus components (diameter ≤ a few) all
variants run the same number of rounds, so the question is what the
extra join costs at sf0.1 (first A/B: always-jump m3 0.911 s vs plain
0.742 s — which is why the default defers the jump).

Protocol (the ab_pq_fit_r8.py playbook): ONE session, warm codegen for
BOTH variants first, then interleave A/B/A/B/A/B so machine drift hits
both arms equally; median-of-3 per arm; results asserted identical
(sorted collect compare) before any timing is believed. Per-arm load
telemetry (getloadavg + /proc/stat busy-fraction) recorded so a
drifted arm self-identifies.

Run: python tools/ab_cc_r10.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)


def connected_components_plain(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """The r9 form, verbatim: min-label propagation WITHOUT the jump
    join — one join + one aggregate per round, O(diameter) rounds."""
    edges = pairs.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
    und = (
        edges.unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    changed = 0
    for _ in range(max_iter):
        nbr = (
            und.join(labels.withColumnsRenamed({"id": "b", "comp": "nc"}), "b")
            .groupBy("a")
            .agg(F.min("nc").alias("nbr_min"))
            .withColumnRenamed("a", "id")
        )
        new_comp = F.least(F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp")))
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                new_comp.alias("new_comp"),
                (new_comp != F.col("comp")).cast("long").alias("chg"),
            )
            .withColumnRenamed("new_comp", "comp")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.sum("chg")).collect()[0][0] or 0
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError("plain CC did not converge")
    return labels


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup
    from topn_clashroyal_etl_sql_snapshot_spark.plans import llm_queries

    spark = get_spark(app_name="ab_cc_r10")
    # The real input of the dedup_components driver row: exact trigram
    # Jaccard >= 0.5 pairs over the documents table, session-cached so
    # both arms time ONLY the component resolution.
    pairs = llm_queries._jaccard_pairs_cached(spark, sf_dir)
    pairs.collect()

    def run_hybrid():
        return dedup.connected_components(pairs)  # jump_start=2 default

    def run_jump():
        return dedup.connected_components(pairs, jump_start=0)

    def run_plain():
        return connected_components_plain(pairs)

    # Identity gate before timing is believed.
    a = sorted(map(tuple, run_hybrid().collect()))
    j = sorted(map(tuple, run_jump().collect()))
    b = sorted(map(tuple, run_plain().collect()))
    assert a == j == b, (
        f"variant results differ: {len(a)} vs {len(j)} vs {len(b)} rows"
    )
    print(f"identity: OK ({len(a)} labelled nodes)")

    # Warm all arms, then interleave.
    run_hybrid().collect()
    run_jump().collect()
    run_plain().collect()
    arms = (("hybrid", run_hybrid), ("jump", run_jump), ("plain", run_plain))
    times: dict[str, list[float]] = {n: [] for n, _ in arms}
    tele: dict[str, list] = {n: [] for n, _ in arms}
    for _ in range(3):
        for name, fn in arms:
            load1 = os.getloadavg()[0]
            b0, t0 = _cpu_busy()
            t = time.perf_counter()
            fn().collect()
            times[name].append(time.perf_counter() - t)
            b1, t1 = _cpu_busy()
            tele[name].append(
                (round(load1, 2), round((b1 - b0) / max(t1 - t0, 1e-9), 3))
            )
    for name in ("hybrid", "jump", "plain"):
        med = statistics.median(times[name])
        print(
            f"{name}: m3={med:.3f}s samples={[round(s, 3) for s in times[name]]} "
            f"telemetry={tele[name]}"
        )


if __name__ == "__main__":
    main()
