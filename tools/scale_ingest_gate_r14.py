#!/usr/bin/env python
"""Multi-day cost curve for the r14 unified ingest funnel — the
adversarial-scale proof for the round's headline surface: does a
day's cost stay ~FLAT as the persisted states grow, the way the
design claims (append-only hardlink publishes, broadcast-probed
indexes, batch-sized verification sides)?

Shape: bootstrap a 10k-doc seed corpus (text + embeddings, two
sources), then run TEN 1k-doc days through ``run_daily_ingest`` —
the exact engine ``streaming_ingest_gate`` invokes per micro-batch —
with the semantic leg ON. Day recipes are adversarial where it
matters:

- every day carries 10% byte recrawls of seed docs (exact-gate load),
  5% same-id changed-content recrawls (the r14 by-id gate's path),
  10% near-dups of PRIOR-day admissions (the index must advance), and
  75% genuinely new docs;
- the mixture recipe is web-skewed while supply alternates, so the
  ledger gate does real water-filling work every day.

Recorded per day: wall seconds, admitted counts, the append-state
modes (linked vs compacted), and the fingerprint/minhash/sketches
file counts (the compaction bound in action). The claim under test:
day-10 cost ≈ day-1 cost (within noise), file counts bounded by
``compact_max_files`` + day delta, and no term grows with the
accumulated corpus. Run idle: python tools/scale_ingest_gate_r14.py
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

OUT = "/tmp/scale_ingest_gate_r14"
SEED_N = 10_000
DAY_N = 1_000
DAYS = 10
DIM = 32
PLANES, ROTS, THR = 8, 2, 0.95
RECIPE = {"web": 0.6, "books": 0.4}


def _doc(i: int, tag: str) -> str:
    # unique token streams per id; near-dups are planted by text reuse
    return f"{tag}{i} " + " ".join(f"{tag}{i}w{j}" for j in range(30))


def _embed(df):
    """Deterministic per-id embedding — ONE derivation shared by the
    seed, recrawl, and near-dup frames (a drifted copy would silently
    measure mismatched vectors; r14 review finding)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "embedding",
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.xxhash64(F.col("doc_id"), d).cast("double")
                / F.lit(float(1 << 63))
            ).cast("float"),
        ),
    )


def synth(spark, ids, tag):
    return _embed(spark.createDataFrame(
        [(i, _doc(i, tag), "web" if i % 5 else "books") for i in ids],
        "doc_id long, text string, source string",
    ))


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.plans import ingest
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_ingest_gate_r14")
    shutil.rmtree(OUT, ignore_errors=True)
    root = os.path.join(OUT, "state")

    seed = synth(spark, range(SEED_N), "seed").localCheckpoint(eager=True)
    t0 = time.perf_counter()
    ingest.bootstrap_state(
        spark, seed, root, vec_col="embedding",
        semantic_threshold=THR, semantic_planes=PLANES,
        semantic_rotations=ROTS,
    )
    print(json.dumps({
        "phase": "bootstrap", "n": SEED_N,
        "sec": round(time.perf_counter() - t0, 2),
    }), flush=True)

    seed_rows = seed.select("doc_id", "text", "source").limit(200).collect()
    prior_admitted: list = []  # (doc_id, text, source, embedding) rows

    for day in range(1, DAYS + 1):
        base = 1_000_000 * day
        fresh = synth(
            spark, range(base, base + int(DAY_N * 0.75)), f"d{day}x"
        )
        # 10% byte recrawls of seed docs (new ids, same text+source —
        # the exact gate's kill path)
        rec_rows = [
            (base + 900_000 + k, r["text"], r["source"])
            for k, r in enumerate(seed_rows[: int(DAY_N * 0.10)])
        ]
        recrawls = _embed(spark.createDataFrame(
            rec_rows, "doc_id long, text string, source string"
        ))
        # 5% same-id CHANGED-content recrawls of seed ids (the r14
        # by-id gate's kill path)
        id_rec = synth(
            spark, range(int(DAY_N * 0.05)), f"d{day}chg"
        )
        # 10% near-dups of PRIOR-day admissions (text + banner: the
        # MinHash leg vs the ADVANCED index)
        nd_src = prior_admitted[: int(DAY_N * 0.10)]
        parts = [fresh, recrawls, id_rec]
        if nd_src:
            nd = _embed(spark.createDataFrame(
                [
                    (base + 950_000 + k, r["text"] + " crawl banner", r["source"])
                    for k, r in enumerate(nd_src)
                ],
                "doc_id long, text string, source string",
            ))
            parts.append(nd)
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionByName(p)
        batch = batch.localCheckpoint(eager=True)

        gc.collect()
        t0 = time.perf_counter()
        rep = ingest.run_daily_ingest(
            spark, batch, root, RECIPE, vec_col="embedding",
            semantic_threshold=THR, semantic_planes=PLANES,
            semantic_rotations=ROTS,
        )
        wall = round(time.perf_counter() - t0, 2)
        gen = rep["generation"]
        files = {
            name: len([
                f for f in os.listdir(os.path.join(gen, name))
                if f.startswith("part-")
            ])
            for name in ("fingerprints", "minhash", "sketches", "vectors")
        }
        prior_admitted = rep["mixed"].select(
            "doc_id", "text", "source"
        ).limit(200).collect()
        print(json.dumps({
            "day": day, "sec": wall, "batch_in": rep["batch_in"],
            "exact_dropped": rep["exact_dropped"],
            "id_recrawl_dropped": rep["id_recrawl_dropped"],
            "neardup_dropped": rep["neardup_dropped"],
            "mixture_admitted": rep["mixture_admitted"],
            "modes": rep["state_modes"], "files": files,
            "load1": round(os.getloadavg()[0], 2),
        }), flush=True)

    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
