#!/usr/bin/env python
"""Composed curation pipeline at 1x/3x/10x WITH the incremental gates
in the loop (r10 verdict ask #8) — the production daily-ingest shape:

    batch → incremental exact dedup vs a PERSISTED (index, bloom
    bitmap) pair → unicode/PII hygiene → lang-ID + quality +
    repetition gates → MinHash-LSH near-dup components, KEEP/DROP →
    n-gram benchmark decontamination → leakage-safe component split →
    training-shard sink (manifest included)

This completes the r7 funnel story (gates-only composition measured
1.74x at 3x) for the FULL composed path. Replica recipe: the r9
character-rotation trick CANNOT be used here — rotated text is not
English to the language-ID gate, so every non-identity variant died
at stage 1 and the 3x run produced byte-identical output to 1x
(caught in this harness's first session). Instead, variant v ≥ 1
reorders each document's WORDS by xxhash64(v, word): character and
word statistics are preserved (lang-ID, quality, and stopword gates
see normal English), within-variant near-dup structure is preserved
(near-equal word multisets hash-sort to near-equal sequences), and
cross-variant 3-word shingles vanish (orderings differ per seed), so
candidate generation still scales with the honest corpus term. v=0
is the identity — 1x = sf0.1 documents exactly.

Per scale the persisted index covers 10% of the batch (doc_id % 10
== 0, the planted already-ingested slice) plus 2M synthetic
fingerprints so the index is realistically larger than any batch;
both index and bitmap are read back from parquet like a real day-N
run. Timed run = the whole composition through the day's PUBLISH —
r12: the updated fingerprint index, updated Bloom bitmap, and the
day's shard set commit together through
``snapshot.publish_generation`` (one atomic pointer flip — the
joint-atomic semantics the production loop runs), so the timed shape
now includes the coupled-state writes, not just the shard sink.

Run: python tools/scale_funnel_r11.py
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time
from functools import reduce
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators import decontam, dedup  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (  # noqa: E402
    split_by_component,
)
from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (  # noqa: E402
    lang_id_table,
    repetition_stats,
)
from topn_clashroyal_etl_sql_snapshot_spark.sinks import shards  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as snap  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (  # noqa: E402
    cpu_busy as _cpu_busy,
)

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
BASE = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale_funnel_r11"
ID_OFFSET = 10_000_000
M_BITS, K = 1 << 26, 5  # ~2.2M index keys -> fill ~0.15
SYNTH_INDEX = 2_000_000


def build_batch(spark, mult: int) -> str:
    """1x/3x/10x replica documents (the scale_replicas_r9 recipe)."""
    dest = f"{OUT}/x{mult}/documents.parquet"
    if os.path.exists(dest):
        return f"{OUT}/x{mult}"
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for v in range(mult):
        words = F.split(F.col("text"), " ")
        txt = (
            F.col("text")
            if v == 0
            else F.array_join(
                F.transform(
                    F.array_sort(
                        F.transform(
                            words,
                            lambda w: F.struct(
                                F.xxhash64(F.lit(v).cast("long"), w).alias("h"),
                                w.alias("w"),
                            ),
                        )
                    ),
                    lambda s: s["w"],
                ),
                " ",
            )
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(v * ID_OFFSET)).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    reduce(lambda a, b: a.unionAll(b), parts).write.mode("overwrite").parquet(
        dest
    )
    return f"{OUT}/x{mult}"


def build_index(spark, batch_dir: str, mult: int) -> tuple[str, str]:
    """Persisted (fingerprint index, bloom bitmap) covering the
    planted 10% of the batch plus SYNTH_INDEX synthetic keys."""
    idx_path = f"{OUT}/index_x{mult}"
    bmp_path = f"{OUT}/bitmap_x{mult}"
    if not Path(idx_path).exists():
        docs = spark.read.parquet(f"{batch_dir}/documents.parquet")
        planted = docs.filter(F.col("doc_id") % 10 == 0).select(
            tx.content_fingerprint(F.col("text")).alias("fingerprint")
        )
        synth = spark.range(SYNTH_INDEX).select(
            F.md5(F.concat(F.lit("hist-"), F.col("id").cast("string"))).alias(
                "fingerprint"
            )
        )
        synth.unionAll(planted).write.mode("overwrite").parquet(idx_path)
    if not Path(bmp_path).exists():
        idx = spark.read.parquet(idx_path)
        dedup.bloom_bitmap(idx, m_bits=M_BITS, k=K).write.mode(
            "overwrite"
        ).parquet(bmp_path)
    return idx_path, bmp_path


def run_pipeline(spark, batch_dir: str, idx_path: str, bmp_path: str,
                 state_root: str) -> dict[str, int]:
    batch = spark.read.parquet(f"{batch_dir}/documents.parquet")
    index = spark.read.parquet(idx_path)
    bitmap = spark.read.parquet(bmp_path)

    # 1. incremental exact gate vs the persisted day-N-1 state; the
    # updated (index, bitmap) pair is part of the day's publish below
    admitted, idx_updated, bmp_updated = dedup.dedup_exact_incremental_bloom(
        batch, index, bitmap, m_bits=M_BITS, k=K, max_fill=0.5
    )
    # 2. hygiene (pure projections)
    docs = cl.normalize_unicode_text(admitted)
    docs = docs.withColumn("text", cl.scrub_pii(cl.clean_text(F.col("text"))))
    docs = docs.localCheckpoint(eager=False)  # 5 downstream consumers

    # 3. lang + quality + repetition gates
    flagged = lang_id_table(docs).filter(F.col("predicted_lang") != "und")
    flagged = flagged.filter(tx.quality_score(F.col("text")) >= 0.5)
    keep_rep = repetition_stats(docs).filter(
        (F.col("dup_line_char_frac") <= 0.3)
        & (F.col("top_bigram_char_frac") <= 0.5)
    ).select("doc_id")
    flagged = flagged.join(keep_rep, "doc_id", "left_semi")

    # 4. near-dup components, keep min-id gate survivor per component
    pairs = dedup.minhash_lsh_verified_pairs(docs, threshold=0.5)
    comp = dedup.connected_components(pairs)
    comp_surviving = comp.join(
        flagged.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )
    keepers = comp_surviving.groupBy("comp").agg(F.min("id").alias("keep_id"))
    dropped = (
        comp_surviving.join(keepers, "comp")
        .filter(F.col("id") != F.col("keep_id"))
        .select(F.col("id").alias("doc_id"))
    )
    flagged = flagged.join(dropped, "doc_id", "left_anti")

    # 5. benchmark decontamination (held-out doc_id % 20 slice)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    hits = decontam.contamination_hits(docs, bench, n=8)
    flagged = flagged.join(hits.select("doc_id"), "doc_id", "left_anti")

    # 6. leakage-safe split on the component label
    kept = docs.join(flagged.select("doc_id"), "doc_id", "left_semi")
    kept = split_by_component(
        kept, comp, {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 7. joint-atomic day publish (part of the timed shape): updated
    # exact-gate state + the day's shard set commit in ONE pointer
    # flip — r12, the production crash-consistency semantics. The
    # fingerprint index is APPEND-ONLY, so the day writes hardlinks of
    # the persisted index's part files plus the batch's DELTA
    # fingerprints instead of rewriting the 2M+-row index (the
    # rewrite dominated the first r12 measurement's publish cost);
    # linking from the STATIC idx_path keeps repeated timed runs
    # byte-identical.
    delta_fps = admitted.select(
        tx.content_fingerprint(F.col("text")).alias("fingerprint")
    ).distinct()

    def day_publish(gen: str) -> None:
        fp_dir = os.path.join(gen, "fingerprints")
        snap.link_state_files(idx_path, fp_dir)
        delta_fps.write.mode("append").parquet(fp_dir)
        bmp_updated.write.parquet(os.path.join(gen, "bloom"))
        shards.write_training_shards(
            kept.select("doc_id", "text", "source", "split"),
            os.path.join(gen, "shards"),
            key="doc_id",
            n_shards=8,
        )

    snap.publish_generation(state_root, day_publish)
    out = shards.read_training_shards(
        spark, os.path.join(snap.current_generation(state_root), "shards")
    )
    return {r["split"]: r["n"] for r in
            out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="scale_funnel_r11")
    points = {}
    for mult in (1, 3, 10):
        bdir = build_batch(spark, mult)
        idx, bmp = build_index(spark, bdir, mult)
        fill = dedup.bloom_fill_fraction(
            spark.read.parquet(bmp), M_BITS
        )
        state_root = f"{OUT}/state_x{mult}"
        run_pipeline(spark, bdir, idx, bmp, state_root)  # warm
        samples, counts = [], None
        l0 = os.getloadavg()[0]
        b0, t0j = _cpu_busy()
        for _ in range(3):
            gc.collect()
            t0 = time.perf_counter()
            counts = run_pipeline(spark, bdir, idx, bmp, state_root)
            samples.append(time.perf_counter() - t0)
        b1, t1j = _cpu_busy()
        points[mult] = {
            "m3": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "splits": counts,
            "docs_out": sum(counts.values()),
            "bloom_fill": round(fill, 3),
            "load1": round(l0, 2),
            "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
        }
        print(f"x{mult}: {points[mult]}", flush=True)

    base = points[1]["m3"]
    print("\n| scale | m3 (s) | wall vs 1x | docs out | bloom fill |")
    print("|---|---|---|---|---|")
    for m, r in points.items():
        print(
            f"| {m}x | {r['m3']} | {r['m3'] / base:.2f}x "
            f"| {r['docs_out']:,} | {r['bloom_fill']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
