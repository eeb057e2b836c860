"""Production-shape incremental corpus ingest: dedup each day's batch
against a PERSISTED signature index, never against the full corpus.

Executable documentation for the dedup family's intended composition
at scale (the registered rows exercise the batch self-dedup shape;
THIS is the shape a daily pipeline runs):

1. **Day 0** — build the corpus fingerprint + signature indexes once
   (``content_fingerprint`` / ``minhash_signatures``) and persist
   them; the raw texts are never needed again for candidate
   generation.
2. **Day N, exact gate FIRST** — the Bloom-prefiltered
   ``dedup_exact_incremental_bloom`` drops byte-identical recrawls
   before any shingling (the composition contract the LSH hot-bucket
   cap's recall argument assumes: identical copies never reach the
   banded join). The batch probes the day-0 BITMAP, and the
   fingerprint index — corpus-sized in production — is touched only
   through one broadcast-probed scan, never shuffled; the returned
   updated bitmap persists alongside the updated index for day N+1.
3. **Day N, near-dup** — ``minhash_lsh_incremental`` signs the
   surviving batch (one pass over batch texts only), band-joins it
   against the index, and returns (a) near-dup pairs touching the
   batch and (b) the updated index to persist for day N+1. Cost
   scales with the batch and the colliding index rows — never a
   full-corpus rescan.
4. **Admit / drop** — ``connected_components`` +
   ``component_keepers`` decide keepers; new docs duplicating an
   index doc drop (the corpus member is canonical), genuinely-new
   docs and within-batch keepers are admitted.
5. **Persisted labels (r11)** — the day's pairs also merge into the
   PERSISTED corpus component labeling via
   ``connected_components_incremental``: batch endpoints broadcast-
   probe the labels frame, only touched components re-resolve, and
   the labels frame is never shuffled — so ``split_by_component``
   keeps a current, leakage-safe component key across ingest days
   without ever re-walking historical pairs.
   **Persisted keepers (r12)**: the corpus keeper decisions ride the
   same incremental discipline — ``component_keepers_incremental``
   re-picks champions only inside components the batch touched and
   reuses every other prior decision verbatim (equal to the full
   re-pick, test-pinned).
6. **Mixture ledger (r11)** — the admitted docs pass the
   ``mixture_sample_incremental`` gate against a persisted per-domain
   kept-weight ledger, so the RUNNING corpus converges to the target
   recipe across days even though each day's supply is skewed.
7. **Joint-atomic publish (r12)** — the day's SIX coupled states
   (fingerprint index, Bloom bitmap, MinHash index, component labels,
   keeper decisions, mixture ledger) plus the day's admitted shard
   set are written under ONE generation directory and committed by a
   single atomic pointer flip (``snapshot.publish_generation``) — a
   mid-day crash can never desynchronize them (e.g. a ledger counting
   docs the shard write never committed); day N+1 reopens everything
   through ``current_generation``. This is the reference's
   one-transaction refresh (``scripts/etl_snapshot_topn.py:363-364``)
   applied to the incremental loop's file states.

Run: ``python examples/incremental_ingest.py [sf_dir] [state_root]``
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup
from topn_clashroyal_etl_sql_snapshot_spark.sinks import shards
from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as snap
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import read_testdata

_STATES = ("fingerprints", "bloom", "minhash", "labels", "keepers", "ledger")


def run(spark, sf_dir: str, state_root: str | None = None) -> dict:
    if state_root is None:
        state_root = tempfile.mkdtemp(prefix="ingest_state_")
    docs = read_testdata(spark, sf_dir, "documents")
    # split the testdata corpus into an established corpus and a
    # "today's crawl" batch; plant a cross-batch near-duplicate AND an
    # exact recrawl so both gate paths demonstrably fire at any sf
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    sample = corpus.orderBy("doc_id").limit(1).collect()[0]
    batch = docs.filter(F.col("doc_id") % 10 == 0).unionAll(
        spark.createDataFrame(
            [(10_000_000 + sample["doc_id"],
              sample["text"] + " trailing crawl banner",
              sample["lang"], sample["source"], sample["n_chars"]),
             (20_000_000 + sample["doc_id"],
              sample["text"],                     # byte-identical recrawl
              sample["lang"], sample["source"], sample["n_chars"])],
            docs.schema,
        )
    )

    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    quality = docs.select(
        F.col("doc_id").alias("id"),
        F.length("text").cast("double").alias("score"),
    )

    # Day 0: build all six coupled states and commit them as ONE
    # generation (a crash mid-write leaves no generation at all)
    def day0(gen: str) -> None:
        corpus.select(
            tx.content_fingerprint(F.col("text")).alias("fingerprint")
        ).write.parquet(os.path.join(gen, "fingerprints"))
        fp = spark.read.parquet(os.path.join(gen, "fingerprints"))
        dedup.bloom_bitmap(fp).write.parquet(os.path.join(gen, "bloom"))
        dedup.minhash_signatures(corpus).write.parquet(
            os.path.join(gen, "minhash")
        )
        labels0 = dedup.connected_components(
            dedup.minhash_lsh_verified_pairs(corpus, threshold=0.5)
        ).localCheckpoint(eager=True)  # two consumers below
        labels0.write.parquet(os.path.join(gen, "labels"))
        dedup.component_keepers(labels0, quality).write.parquet(
            os.path.join(gen, "keepers")
        )
        corpus.groupBy("source").agg(
            F.count(F.lit(1)).cast("double").alias("kept_w")
        ).write.parquet(os.path.join(gen, "ledger"))

    gen1 = snap.publish_generation(state_root, day0, expected_parent=None)

    # Day 1 opens yesterday's generation through the pointer — every
    # state is a plain parquet read of the committed set
    cur = snap.current_generation(state_root)
    st = {name: spark.read.parquet(os.path.join(cur, name)) for name in _STATES}

    # Day 1, exact gate first: identical recrawls drop before any
    # shingling happens — the batch probes the bitmap, and only the
    # bloom-maybe survivors reach the fingerprint index (as a
    # broadcast; at production scale the index never shuffles)
    n_batch_raw = batch.count()
    batch, fp_updated, bloom_updated = dedup.dedup_exact_incremental_bloom(
        batch, st["fingerprints"], st["bloom"]
    )
    batch = batch.localCheckpoint(eager=True)
    exact_dropped = n_batch_raw - batch.count()

    # Day 1, near-dup: batch vs index + within-batch, one pass over
    # the surviving batch texts
    pairs, updated = dedup.minhash_lsh_incremental(
        batch, st["minhash"], threshold=0.5
    )
    pairs = pairs.localCheckpoint(eager=True)

    # Admission policy: the INDEX member of a cross component is
    # canonical — implemented by scoring ONLY corpus members
    # (component_keepers' scored-beats-unscored rule then makes the
    # corpus twin win every cross component outright, and all-unscored
    # within-batch components fall back to min-id). Production that
    # wants quality-based keeps INSIDE the batch scores both tiers,
    # keeping corpus scores strictly above batch scores.
    comp = dedup.connected_components(pairs)
    corpus_quality = quality.join(
        corpus.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )
    keep = dedup.component_keepers(comp, corpus_quality)
    batch_ids = [r["doc_id"] for r in batch.select("doc_id").collect()]
    bset = set(batch_ids)
    dropped = {
        r["id"]
        for r in keep.filter(~F.col("keep")).collect()
        if r["id"] in bset
    }
    admitted = len(batch_ids) - len(dropped)
    planted_id = 10_000_000 + sample["doc_id"]

    # Day 1, persisted labels: merge the day's pairs into the corpus
    # component labeling — the labels frame is only map-side scanned,
    # and the planted near-dup must land in its corpus twin's component
    labels1 = dedup.connected_components_incremental(
        st["labels"], pairs
    ).localCheckpoint(eager=True)
    planted_comp = {
        r["id"]: r["comp"]
        for r in labels1.filter(
            F.col("id").isin(planted_id, sample["doc_id"])
        ).collect()
    }

    # Day 1, persisted keepers (r12): champions re-picked ONLY inside
    # batch-touched components, prior decisions reused verbatim — the
    # corpus-wide keeper frame follows the labels frame incrementally.
    # Scored with the SAME corpus-only frame as the admission gate
    # (review finding: scoring batch members here let a dedup-DROPPED
    # batch doc out-score its corpus twin and be published as the
    # component's keeper — the persisted keepers must agree with the
    # admission policy's corpus-is-canonical rule)
    keepers1 = dedup.component_keepers_incremental(
        labels1, st["keepers"], pairs, corpus_quality
    ).localCheckpoint(eager=True)
    n_keepers1 = keepers1.filter(F.col("keep")).count()

    # Day 1, mixture ledger: the dedup-admitted docs pass the domain
    # gate against yesterday's per-source kept-weight ledger, so the
    # running mix tracks the recipe
    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    sources = sorted(
        r["source"] for r in corpus.select("source").distinct().collect()
    )
    recipe = {s: 1.0 / len(sources) for s in sources}
    # anti-join against the keep frame — no driver round-trip of ids
    # (the production shape; `dropped` above is collected only for the
    # example's reporting)
    admitted_docs = batch.join(
        keep.filter(~F.col("keep")).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )
    mixed, ledger1 = sampling.mixture_sample_incremental(
        admitted_docs, st["ledger"], "source", recipe
    )
    mixed = mixed.localCheckpoint(eager=True)
    n_mixed = mixed.count()

    # Day 1 commit: all six updated states AND the day's admitted
    # shard set move in ONE pointer flip — no partial day-1 state can
    # ever serve
    def day1(gen: str) -> None:
        fp_updated.write.parquet(os.path.join(gen, "fingerprints"))
        bloom_updated.write.parquet(os.path.join(gen, "bloom"))
        updated.write.parquet(os.path.join(gen, "minhash"))
        labels1.write.parquet(os.path.join(gen, "labels"))
        keepers1.write.parquet(os.path.join(gen, "keepers"))
        ledger1.write.parquet(os.path.join(gen, "ledger"))
        if n_mixed:
            shards.write_training_shards(
                mixed, os.path.join(gen, "shards"), key="doc_id", n_shards=4
            )

    # expected_parent=cur: every day-1 state above derives from cur's
    # reads — an interleaved writer's publish must refuse this flip
    # instead of being silently dropped (r14)
    gen2 = snap.publish_generation(state_root, day1, expected_parent=cur)
    cur2 = snap.current_generation(state_root)
    ledger_total = (
        spark.read.parquet(os.path.join(cur2, "ledger"))
        .agg(F.sum("kept_w"))
        .collect()[0][0]
    )
    shards_ok = bool(n_mixed) and all(
        r["ok"]
        for r in shards.verify_shards(
            spark, os.path.join(cur2, "shards")
        ).collect()
    )

    return {
        "corpus": corpus.count(),
        "exact_recrawls_dropped": exact_dropped,
        "batch": len(batch_ids),
        "pairs_touching_batch": pairs.count(),
        "batch_docs_dropped": len(dropped),
        "batch_docs_admitted": admitted,
        "planted_dup_dropped": planted_id in dropped,
        "updated_index_rows": updated.count(),
        "updated_bloom_words": bloom_updated.count(),
        "updated_labels_rows": labels1.count(),
        "updated_keeper_rows": keepers1.count(),
        "updated_keep_true": n_keepers1,
        "mixture_admitted": n_mixed,
        "mixture_ledger_total": ledger_total,
        "pair_endpoint_ids": (
            pairs.select(F.col("id1").alias("i"))
            .unionAll(pairs.select(F.col("id2").alias("i")))
            .distinct()
            .count()
        ),
        "planted_pair_shares_component": (
            len(planted_comp) == 2
            and planted_comp[planted_id] == planted_comp[sample["doc_id"]]
        ),
        "generations": [os.path.basename(gen1), os.path.basename(gen2)],
        "current_generation": os.path.basename(cur2),
        "day1_shards_verified": shards_ok,
    }


if __name__ == "__main__":
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="incremental_ingest_example")
    out = run(spark, sf_dir, root)
    print(out)
    spark.stop()
