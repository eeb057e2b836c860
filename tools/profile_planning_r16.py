#!/usr/bin/env python
"""Driver-side PLANNING-time attribution for one ingest day — the r16
follow-up to tools/profile_ingest_r15.py: that tool times whole
actions (planning + execution together); this one isolates the
Catalyst term by shimming the action surfaces to first force
`queryExecution().executedPlan()` (analysis + optimization + physical
planning, no job) and time it separately from the job that follows.
Names WHICH plan's compilation the remaining ~2-3 s/batch floor term
lives in, so a width cut can be targeted instead of guessed.

Run: python tools/profile_planning_r16.py [DAY_N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import traceback
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

from scale_ingest_gate_r14 import (  # noqa: E402
    PLANES, RECIPE, ROTS, SEED_N, THR, _embed, synth,
)

OUT = "/tmp/profile_planning_r16"
RECORDS: list[dict] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()[:-2]):
        fn = fr.filename
        if "/tools/" in fn or "profile_planning" in fn:
            continue
        if "/pyspark/" in fn or "/py4j/" in fn:
            continue
        return f"{fn.rsplit('/', 1)[-1]}:{fr.lineno}"
    return "?"


def main() -> None:
    day_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000
    from pyspark.sql.classic.dataframe import DataFrame

    from topn_clashroyal_etl_sql_snapshot_spark.plans import ingest
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="profile_planning_r16")
    shutil.rmtree(OUT, ignore_errors=True)
    root = os.path.join(OUT, "state")

    seed = synth(spark, range(SEED_N), "seed").localCheckpoint(eager=True)
    ingest.bootstrap_state(
        spark, seed, root, vec_col="embedding",
        semantic_threshold=THR, semantic_planes=PLANES,
        semantic_rotations=ROTS,
    )
    seed_rows = seed.select("doc_id", "text", "source").limit(200).collect()
    base = 1_000_000
    fresh = synth(spark, range(base, base + int(day_n * 0.75)), "d1x")
    rec = _embed(spark.createDataFrame(
        [
            (base + 900_000 + k, r["text"], r["source"])
            for k, r in enumerate(seed_rows[: int(day_n * 0.10)])
        ],
        "doc_id long, text string, source string",
    ))
    id_rec = synth(spark, range(int(day_n * 0.05)), "d1chg")
    batch = fresh.unionByName(rec).unionByName(id_rec).localCheckpoint(
        eager=True
    )

    orig_ckpt = DataFrame.localCheckpoint

    def timed_ckpt(self, eager=True):
        at = _caller()
        t0 = time.perf_counter()
        # force analysis+optimization+physical planning WITHOUT a job
        self._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0
        t1 = time.perf_counter()
        r = orig_ckpt(self, eager=eager)
        t_run = time.perf_counter() - t1
        RECORDS.append({
            "at": at, "eager": eager,
            "plan_sec": round(t_plan, 3), "run_sec": round(t_run, 3),
        })
        return r

    DataFrame.localCheckpoint = timed_ckpt

    t0 = time.perf_counter()
    ingest.run_daily_ingest(
        spark, batch, root, RECIPE, vec_col="embedding",
        semantic_threshold=THR, semantic_planes=PLANES,
        semantic_rotations=ROTS,
    )
    wall = time.perf_counter() - t0

    plan_total = sum(r["plan_sec"] for r in RECORDS)
    run_total = sum(r["run_sec"] for r in RECORDS)
    print(json.dumps({
        "day_n": day_n,
        "day_wall_sec": round(wall, 2),
        "n_ckpts": len(RECORDS),
        "plan_sec_total": round(plan_total, 2),
        "ckpt_run_sec_total": round(run_total, 2),
        "load1": round(os.getloadavg()[0], 2),
    }))
    for r in sorted(RECORDS, key=lambda r: -r["plan_sec"]):
        if r["plan_sec"] >= 0.01:
            print(
                f"plan {r['plan_sec']:6.2f}s  run {r['run_sec']:6.2f}s  "
                f"{'eager' if r['eager'] else 'lazy ':<5}  {r['at']}"
            )

    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
