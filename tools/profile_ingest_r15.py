#!/usr/bin/env python
"""Per-action decomposition of one `run_daily_ingest` day — the r15
follow-up to the r14 10-day curve: the curve proved the day's cost is
a flat orchestration floor; this names WHICH driver-side actions the
floor is made of, so the cut (observe-fused counters, lazy
checkpoints) can be verified action by action and the next cut
targeted instead of guessed.

Method: shim the four action surfaces (`DataFrame.localCheckpoint`,
`DataFrameWriter.parquet`, `DataFrame.count`, `DataFrame.collect`)
with wall-clock timers that record the caller's file:line, bootstrap
the same 10k-doc state as tools/scale_ingest_gate_r14.py, run ONE
adversarial 1k-doc day, and print every action ≥ 10 ms sorted by
cost, plus the action count and the un-attributed remainder.

Run idle: python tools/profile_ingest_r15.py
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
    DAY_N, PLANES, RECIPE, ROTS, SEED_N, THR, _embed, synth,
)

OUT = "/tmp/profile_ingest_r15"
ACTIONS: list[dict] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()[:-2]):
        fn = fr.filename
        if "/tools/" in fn or "profile_ingest" in fn:
            continue
        if "/pyspark/" in fn or "/py4j/" in fn:
            continue
        return f"{fn.rsplit('/', 1)[-1]}:{fr.lineno}"
    return "?"


def _shim(owner, name, label, method=True):
    """Wrap `owner.name` (method on a class, or function on a module —
    getattr/setattr work identically) with a wall-clock recorder;
    `method=True` drops the self argument from the display."""
    orig = getattr(owner, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        shown = a[1:] if method else a
        ACTIONS.append({
            "kind": label, "sec": time.perf_counter() - t0,
            "at": _caller(), "args": repr(shown)[:40],
        })
        return r

    setattr(owner, name, timed)


def main() -> None:
    # patch the CLASSIC classes — `pyspark.sql.DataFrame` is the
    # abstract base in Spark 4 and the classic subclass overrides the
    # action methods, so patching the base intercepts nothing
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from topn_clashroyal_etl_sql_snapshot_spark.plans import ingest
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="profile_ingest_r15")
    shutil.rmtree(OUT, ignore_errors=True)
    root = os.path.join(OUT, "state")

    seed = synth(spark, range(SEED_N), "seed").localCheckpoint(eager=True)
    ingest.bootstrap_state(
        spark, seed, root, vec_col="embedding",
        semantic_threshold=THR, semantic_planes=PLANES,
        semantic_rotations=ROTS,
    )
    seed_rows = seed.select("doc_id", "text", "source").limit(200).collect()

    # the scale harness's day-2 shape: 75% fresh, 10% byte recrawls,
    # 5% same-id changed content, (no prior-day near-dups on day 1)
    base = 1_000_000
    fresh = synth(spark, range(base, base + int(DAY_N * 0.75)), "d1x")
    rec = _embed(spark.createDataFrame(
        [
            (base + 900_000 + k, r["text"], r["source"])
            for k, r in enumerate(seed_rows[: int(DAY_N * 0.10)])
        ],
        "doc_id long, text string, source string",
    ))
    id_rec = synth(spark, range(int(DAY_N * 0.05)), "d1chg")
    batch = fresh.unionByName(rec).unionByName(id_rec).localCheckpoint(
        eager=True
    )

    _shim(DataFrame, "localCheckpoint", "ckpt")
    _shim(DataFrame, "count", "count")
    _shim(DataFrame, "collect", "collect")
    _shim(DataFrameWriter, "parquet", "write")

    from pyspark.sql.readwriter import DataFrameReader

    _shim(DataFrameReader, "parquet", "read")

    from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as snap

    _shim(snap, "fsync_dir_tree", "fsync_dir_tree", method=False)
    _shim(snap, "link_state_files", "link_state_files", method=False)

    t0 = time.perf_counter()
    ingest.run_daily_ingest(
        spark, batch, root, RECIPE, vec_col="embedding",
        semantic_threshold=THR, semantic_planes=PLANES,
        semantic_rotations=ROTS,
    )
    wall = time.perf_counter() - t0

    attributed = sum(a["sec"] for a in ACTIONS)
    print(json.dumps({
        "day_wall_sec": round(wall, 2),
        "n_actions": len(ACTIONS),
        "attributed_sec": round(attributed, 2),
        "unattributed_sec": round(wall - attributed, 2),
    }))
    for a in sorted(ACTIONS, key=lambda a: -a["sec"]):
        if a["sec"] >= 0.01:
            print(
                f"{a['sec']:7.2f}s  {a['kind']:<7}  {a['at']:<28}"
                f"  {a['args']}"
            )

    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
