#!/usr/bin/env python
"""Per-trigger latency curve for `streaming_ingest_gate` — r14 verdict
next #2: the 10-day harness (tools/scale_ingest_gate_r14.py) drives
`run_daily_ingest` directly, so the batch funnel's cost is measured
but the STREAMING gate's end-to-end per-trigger latency — foreachBatch
dispatch + replay guard + the funnel + the per-batch generation
publish + checkpoint commit — was design-argued, never curved. This
measures it: the number a production stream plans its trigger interval
around.

Shape: bootstrap a 10k-doc seed state (same corpus family as the
10-day harness, semantic leg ON), then for each micro-batch size in
{100, 1k, 5k} docs run a FRESH state root through the gate with
``maxFilesPerTrigger=1`` over 10 pre-written landing files (90% new
docs, 10% byte recrawls of seed — the exact gate does real work every
trigger) and read the per-trigger wall from the query's progress
events (``durationMs.triggerExecution``). Per size: every trigger's
ms, median, p90, and docs/sec at the median.

The claim under test: per-trigger latency is a FLAT floor plus a term
scaling with batch size — so larger micro-batches amortize the floor
(docs/sec rises with batch size), and the floor itself is the r15
orchestration-cut funnel cost, not foreachBatch overhead.

Run idle: python tools/scale_stream_gate_r15.py
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

sys.path.insert(0, str(_REPO / "tools"))
from scale_ingest_gate_r14 import (  # noqa: E402
    PLANES, RECIPE, ROTS, SEED_N, THR, _doc, synth,
)

OUT = "/tmp/scale_stream_gate_r15"
BATCH_SIZES = (100, 1_000, 5_000)
TRIGGERS = 10


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.plans import ingest
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.streaming.incremental import (
        streaming_ingest_gate,
    )

    spark = get_spark(app_name="scale_stream_gate_r15")
    shutil.rmtree(OUT, ignore_errors=True)

    seed = synth(spark, range(SEED_N), "seed").localCheckpoint(eager=True)
    seed_rows = seed.select("doc_id", "text", "source").limit(500).collect()

    for size in BATCH_SIZES:
        root = os.path.join(OUT, f"state_{size}")
        out_dir = os.path.join(OUT, f"out_{size}")
        land = os.path.join(OUT, f"landing_{size}")
        os.makedirs(land)
        t0 = time.perf_counter()
        ingest.bootstrap_state(
            spark, seed, root, vec_col="embedding",
            semantic_threshold=THR, semantic_planes=PLANES,
            semantic_rotations=ROTS,
        )
        boot = round(time.perf_counter() - t0, 2)

        # one landing file per trigger: 90% fresh docs, 10% byte
        # recrawls of seed content under new ids (exact-gate work).
        # Embeddings are derived in-gate from doc_id (the gate's
        # `gates=` slot), so landing files stay small JSONL.
        n_rec = size // 10
        for t in range(TRIGGERS):
            base = 10_000_000 + t * 1_000_000 + size
            with open(os.path.join(land, f"t{t:03d}.jsonl"), "w") as f:
                for k in range(size - n_rec):
                    i = base + k
                    f.write(json.dumps({
                        "doc_id": i, "text": _doc(i, f"s{size}t{t}x"),
                        "source": "web" if i % 5 else "books",
                    }) + "\n")
                for k, r in enumerate(seed_rows[:n_rec]):
                    f.write(json.dumps({
                        "doc_id": base + 900_000 + k, "text": r["text"],
                        "source": r["source"],
                    }) + "\n")

        from scale_ingest_gate_r14 import _embed

        gc.collect()
        t0 = time.perf_counter()
        q = (
            streaming_ingest_gate(
                spark.readStream.schema(
                    "doc_id long, text string, source string"
                )
                .option("maxFilesPerTrigger", 1)
                .json(land),
                root, out_dir, RECIPE,
                gates=_embed,  # derive the embedding column in-gate
                vec_col="embedding",
                semantic_threshold=THR, semantic_planes=PLANES,
                semantic_rotations=ROTS,
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(1800), "stream did not terminate"
        wall = round(time.perf_counter() - t0, 2)

        trig_ms = sorted(
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        )
        med = trig_ms[len(trig_ms) // 2]
        # nearest-rank p90: ceil(0.9 n)-th order statistic (at n=10
        # that is index 8, NOT the max — r15 review finding)
        import math

        p90 = trig_ms[max(0, math.ceil(0.9 * len(trig_ms)) - 1)]
        print(json.dumps({
            "batch_size": size, "triggers": len(trig_ms),
            "bootstrap_sec": boot, "stream_wall_sec": wall,
            "per_trigger_ms": trig_ms,
            "median_ms": med, "p90_ms": p90,
            "docs_per_sec_at_median": round(size / (med / 1000.0), 1),
            "load1": round(os.getloadavg()[0], 2),
        }), flush=True)

    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
