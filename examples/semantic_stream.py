"""Continuous semantic dedup: seed an embedding index from a corpus,
then gate a stream of new embeddings against it — admissions advance
the index, one atomic generation per micro-batch.

Executable documentation for the r13 streaming composition
(`streaming/incremental.py::streaming_semantic_gate` +
`seed_semantic_state`), the continuous form of the ingest loop's
semantic leg:

1. **Seed** generation 1 from the corpus — its hyperplane sketches
   (the LSH index) and vectors (the exact-cosine verification side),
   published into a DEDICATED root (the gate manages exactly these
   two states and refuses roots carrying others).
2. **Stream** micro-batches of new embeddings through the gate:
   embedding near-dups of indexed content drop (the corpus member
   stays canonical), within-batch duplicate groups keep one member,
   id-recrawls of indexed ids drop at the cheap by-id gate, and each
   batch's admissions commit — output partition + both state deltas —
   behind ONE pointer flip (crash-safe, exactly-once under replay).
3. **Read back**: the admitted output carries per-batch provenance
   (`batch_id=`), and the current generation's vectors ARE the
   deduped corpus-plus-admissions.

Run: ``python examples/semantic_stream.py [sf_dir]``
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

from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as snap
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import read_testdata
from topn_clashroyal_etl_sql_snapshot_spark.streaming.incremental import (
    seed_semantic_state,
    streaming_semantic_gate,
)


def run(spark, sf_dir: str, work_root: str | None = None) -> dict:
    if work_root is None:
        work_root = tempfile.mkdtemp(prefix="semantic_stream_")
    state_dir = os.path.join(work_root, "state")
    out_dir = os.path.join(work_root, "admitted")
    landing = os.path.join(work_root, "landing")
    os.makedirs(landing)

    # 1. corpus = the testdata embeddings table; seed the gate's root
    corpus = read_testdata(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    n_corpus = corpus.count()
    seed_semantic_state(spark, corpus, state_dir, planes=8, rotations=2)

    # 2. two "crawl" batches land as JSONL: new ids 1e6+, where one
    #    doc per batch near-duplicates an indexed embedding (tiny
    #    perturbation), one re-uses an indexed id verbatim (recrawl),
    #    and the rest are fresh random vectors
    base = {
        r["doc_id"]: [float(x) for x in r["embedding"]]
        for r in corpus.orderBy("doc_id").limit(4).collect()
    }
    ids = sorted(base)
    import random

    rng = random.Random(13)
    dim = len(base[ids[0]])

    def fresh():
        return [rng.gauss(0, 1) for _ in range(dim)]

    def neardup(src):
        return [x + rng.gauss(0, 1e-3) for x in base[src]]

    batches = [
        [(1_000_000, neardup(ids[0])), (ids[1], fresh()),
         (1_000_001, fresh())],
        [(1_000_002, neardup(ids[2])), (1_000_003, fresh()),
         # near-dup of batch 0's ADMITTED 1_000_001? no — keep it
         # simple: a second fresh doc
         (1_000_004, fresh())],
    ]
    for k, rows in enumerate(batches):
        with open(os.path.join(landing, f"b{k}.jsonl"), "w") as f:
            for doc_id, emb in rows:
                f.write(json.dumps({"doc_id": doc_id, "embedding": emb}) + "\n")
        os.utime(
            os.path.join(landing, f"b{k}.jsonl"),
            (1_000_000 + k, 1_000_000 + k),
        )

    q = (
        streaming_semantic_gate(
            spark.readStream.schema("doc_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .json(landing),
            state_dir,
            out_dir,
            threshold=0.95,
            planes=8,
            rotations=2,
        )
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(240):
        raise TimeoutError("semantic_stream: availableNow run did not finish")

    admitted = spark.read.parquet(out_dir)
    admitted_ids = {r["doc_id"] for r in admitted.collect()}
    cur = snap.current_generation(state_dir)
    index_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(cur, "vectors")).collect()
    }
    return {
        "corpus": n_corpus,
        "offered": sum(len(b) for b in batches),
        "admitted_ids": admitted_ids,
        "neardups_dropped": sum(
            1
            for b in batches
            for doc_id, _ in b
            if doc_id in (1_000_000, 1_000_002)
            and doc_id not in admitted_ids
        ),
        "recrawl_dropped": ids[1] not in admitted_ids,
        "index_rows": len(index_ids),
        "index_is_corpus_plus_admissions": index_ids
        == {r["doc_id"] for r in corpus.select("doc_id").collect()}
        | admitted_ids,
        "generations": sorted(
            d for d in os.listdir(state_dir) if d.startswith("gen-")
        ),
        "current_generation": os.path.basename(cur),
    }


if __name__ == "__main__":
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="semantic_stream_example")
    out = run(spark, sf)
    print(json.dumps({k: sorted(v) if isinstance(v, set) else v
                      for k, v in out.items()}, default=str, indent=2))
    spark.stop()
