"""The FULL ingest funnel as one continuous stream: bootstrap the
persisted state set from a seed corpus, then gate a stream of daily
crawl batches through exact → MinHash → semantic → mixture admission —
every state plus each batch's admitted docs committing as ONE atomic
generation per micro-batch.

Executable documentation for the r14 unified streaming gate
(`streaming/incremental.py::streaming_ingest_gate`), which runs
`plans.ingest.run_daily_ingest` per micro-batch so the streaming form
cannot drift from the batch loop's semantics:

1. **Bootstrap** the seed corpus's eight states (fingerprints, bloom,
   minhash, labels, keepers, ledger, sketches, vectors) as
   generation 1 — `plans.ingest.bootstrap_state(vec_col=...)`.
2. **Stream** crawl batches through the gate: byte recrawls die at
   the Bloom-prefiltered exact gate, same-id changed-content recrawls
   at the by-id gate, text near-dups at the MinHash leg, embedding
   near-dups at the semantic leg, and the survivors pass the
   domain-mixture ledger — all per micro-batch, all states advancing
   behind one pointer flip.
3. **Read back**: `out_dir/batch_id=N` carries each batch's fully
   admitted docs; the current generation is the whole serving state.

Run: ``python examples/funnel_stream.py [sf_dir]``
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.plans import ingest
from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as snap
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import read_testdata
from topn_clashroyal_etl_sql_snapshot_spark.streaming.incremental import (
    streaming_ingest_gate,
)

_DIM = 16
_SCHEMA = "doc_id long, text string, source string, embedding array<float>"


def _with_embedding(df):
    """Deterministic per-id embedding (executable-doc stand-in for a
    real encoder; xxhash64-derived, so recrawls of an id reproduce it)."""
    return df.withColumn(
        "embedding",
        F.transform(
            F.sequence(F.lit(0), F.lit(_DIM - 1)),
            lambda d: (
                F.xxhash64(F.col("doc_id"), d).cast("double")
                / F.lit(float(1 << 63))
            ).cast("float"),
        ),
    )


def run(spark, sf_dir: str, work_root: str | None = None) -> dict:
    if work_root is None:
        work_root = tempfile.mkdtemp(prefix="funnel_stream_")
    state_root = os.path.join(work_root, "state")
    out_dir = os.path.join(work_root, "admitted")
    landing = os.path.join(work_root, "landing")
    # exist_ok: a re-run with an explicit work_root should reach the
    # engine's own loud refusal (bootstrap on a rooted generation),
    # not die at a directory crumb (r14 review)
    os.makedirs(landing, exist_ok=True)

    # 1. seed corpus: the testdata documents table + derived embeddings
    seed = _with_embedding(
        read_testdata(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
    ).localCheckpoint(eager=True)
    n_seed = seed.count()
    srcs = [r["source"] for r in seed.select("source").distinct().collect()]
    recipe = {s: 1.0 / len(srcs) for s in srcs}
    ingest.bootstrap_state(
        spark, seed, state_root, vec_col="embedding",
        semantic_threshold=0.95, semantic_planes=8, semantic_rotations=2,
    )

    # 2. two crawl days: fresh docs, one byte recrawl of a seed doc
    #    (new id), one same-id changed-content recrawl, one text
    #    near-dup of a seed doc, and day 2 re-offers day 1's first
    #    admitted doc byte-identically (the advanced index must kill it)
    s0 = seed.orderBy("doc_id").limit(2).collect()
    day1 = [
        {"doc_id": 1_000_000, "text": "entirely fresh crawl doc one "
         + " ".join(f"f1w{j}" for j in range(25)), "source": s0[0]["source"]},
        {"doc_id": 1_000_001, "text": s0[0]["text"],
         "source": s0[0]["source"]},                      # byte recrawl
        {"doc_id": int(s0[1]["doc_id"]), "text": "changed content for "
         "an existing id " + " ".join(f"c1w{j}" for j in range(25)),
         "source": s0[1]["source"]},                      # id recrawl
        {"doc_id": 1_000_002, "text": s0[0]["text"] + " crawl banner",
         "source": s0[0]["source"]},                      # text near-dup
    ]
    day2 = [
        {"doc_id": 2_000_000, "text": "entirely fresh crawl doc two "
         + " ".join(f"f2w{j}" for j in range(25)), "source": s0[0]["source"]},
        {"doc_id": 2_000_001, "text": day1[0]["text"],
         "source": day1[0]["source"]},  # byte recrawl of a DAY-1 admission
    ]
    for k, rows in enumerate((day1, day2)):
        with open(os.path.join(landing, f"day{k}.jsonl"), "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        os.utime(
            os.path.join(landing, f"day{k}.jsonl"),
            (1_000_000 + k, 1_000_000 + k),
        )

    q = (
        streaming_ingest_gate(
            _with_embedding(
                spark.readStream.schema(
                    "doc_id long, text string, source string"
                )
                .option("maxFilesPerTrigger", 1)
                .json(landing)
            ),
            state_root,
            out_dir,
            recipe,
            vec_col="embedding",
            semantic_threshold=0.95,
            semantic_planes=8,
            semantic_rotations=2,
        )
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        raise TimeoutError("funnel_stream: availableNow run did not finish")

    per_batch = {
        k: {
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(out_dir, f"batch_id={k}")
            ).collect()
        }
        for k in (0, 1)
    }
    cur = snap.current_generation(state_root)
    return {
        "seed": n_seed,
        "day1_admitted": per_batch[0],
        "day2_admitted": per_batch[1],
        "generations": sorted(
            d for d in os.listdir(state_root) if d.startswith("gen-")
        ),
        "current_generation": os.path.basename(cur),
        "states_in_current": sorted(
            d for d in os.listdir(cur)
            if os.path.isdir(os.path.join(cur, d))
        ),
    }


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="funnel_stream_example")
    out = run(spark, sf_dir)
    print(json.dumps(
        {k: sorted(v) if isinstance(v, set) else v for k, v in out.items()},
        default=str,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
