#!/usr/bin/env python
"""Two-point growth lines for the registered dedup/similarity entries
— r14 verdict next #4: the 100 TB story extrapolated from ONE measured
scale (the sf0.1 bench corpus); this measures the same registered
plans at an sf1-EQUIVALENT corpus (10x documents and embeddings) so
each family's sf0.1 reading becomes a growth line.

Corpus construction (clone-free, the scale_replicas_r9 discipline):
replica k of `documents` rotates the TEXT alphabet by k
(`F.translate` — bijective per-replica character mapping, so replica
vocabularies are disjoint and no artificial cross-replica near-dups
inflate the pair volume; within-replica near-dup structure is
preserved exactly) and offsets doc_id by k*10M; replica k of
`embeddings` multiplies each vector by a deterministic per-replica
±1 sign pattern (cosine between replicas ≈ random, within-replica
geometry EXACT) and offsets vec_id the same way. Replica 0 is the
original bytes. The remaining sf0.1 tables are symlinked — entries
under test read only documents/embeddings.

Entries (the verdict's named families): exact-incremental
(dedup_exact_incremental_gate), MinHash-incremental
(dedup_minhash_incremental), MinHash verified pairs
(dedup_minhash_lsh), the simhash regime decision (dedup_simhash),
the semantic probe (embedding_neardup_incremental), CC-incremental
(dedup_components_incremental). Per entry per scale: median-of-3
warm walls + result rows + load1.

Run idle: python tools/scale_sf1_r15.py
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/scale_sf1_r15"
SF1 = os.path.join(OUT, "sf1")
REPLICAS = 10
DIM = 64
ENTRIES = (
    "dedup_exact_incremental_gate",
    "dedup_minhash_incremental",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup_incremental",
    "dedup_components_incremental",
)

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))

    # the disjoint-vocabulary guarantee holds only if the text is
    # pure [a-z ] — digits/uppercase/punctuation would pass through
    # the a-z rotation verbatim and share shingles across replicas,
    # silently inflating the growth line (r15 review finding). The
    # sf0.1 corpus satisfies this (verified); ENFORCE it so a future
    # corpus change fails loudly instead of skewing the measurement.
    leak = docs.filter(F.col("text").rlike("[^a-z ]")).count()
    if leak:
        raise SystemExit(
            f"{leak} documents contain characters outside [a-z ] — "
            "the per-replica alphabet rotation would no longer make "
            "replica vocabularies disjoint; extend the rotation to "
            "the corpus's full character set first"
        )

    doc_parts, emb_parts = [], []
    for k in range(REPLICAS):
        rot = _ALPHA[k:] + _ALPHA[:k]
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                (
                    F.col("text") if k == 0
                    else F.translate("text", _ALPHA, rot)
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
        # deterministic ±1 per (replica, dim): replica 0 is identity
        signs = [
            1.0 if k == 0 or (hash((k, d)) & 1) == 0 else -1.0
            for d in range(DIM)
        ]
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(s).cast("float") for s in signs]),
                    lambda x, s: (x * s).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    d1 = doc_parts[0]
    for p in doc_parts[1:]:
        d1 = d1.unionByName(p)
    e1 = emb_parts[0]
    for p in emb_parts[1:]:
        e1 = e1.unionByName(p)
    d1.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(SF1, "documents.parquet")
    )
    e1.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(SF1, "embeddings.parquet")
    )
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        dst = os.path.join(SF1, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)


def main() -> None:
    import importlib.util

    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "se", str(_REPO / "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()

    spark = get_spark(app_name="scale_sf1_r15")
    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.perf_counter()
    _build_sf1(spark)
    print(json.dumps({
        "phase": "build_sf1", "replicas": REPLICAS,
        "sec": round(time.perf_counter() - t0, 2),
    }), flush=True)

    for name in ENTRIES:
        fn = qs[name]
        rec: dict = {"entry": name}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", SF1)):
            samples, rows = [], None
            for _ in range(3):
                gc.collect()
                t0 = time.perf_counter()
                out = fn(spark, sf_dir).collect()
                rows = len(out)
                samples.append(time.perf_counter() - t0)
            rec[label] = {
                "m3_sec": round(statistics.median(samples), 2),
                "samples": [round(s, 2) for s in samples],
                "rows": rows,
            }
        rec["growth_x"] = round(
            rec["sf1"]["m3_sec"] / rec["sf0.1"]["m3_sec"], 2
        )
        rec["load1"] = round(os.getloadavg()[0], 2)
        print(json.dumps(rec), flush=True)

    spark.stop()
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
