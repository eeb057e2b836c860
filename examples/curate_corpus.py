#!/usr/bin/env python
"""End-to-end corpus curation on the synthetic testdata — the composed
pipeline a training-data team would actually run, built entirely from
this engine's operators:

    read documents
      → unicode hygiene + PII scrub    (functions/cleaning.py)
      → language ID + quality gates    (operators/textstats.py)
      → repetition/boilerplate gate    (textstats.repetition_stats)
      → near-dup dedup, KEEP/DROP      (MinHash-LSH → components)
      → benchmark decontamination      (operators/decontam.py)
      → DSIR domain targeting          (operators/dsir.py)
      → deterministic train/val/test   (operators/sampling.py)
      → per-source contribution cap    (sampling.per_group_cap)
      → BPE tokenize (train + encode)  (operators/bpe.py)
      → token-budget chunking          (operators/chunking.py)
      → sequence packing on REAL
        per-chunk token counts         (operators/packing.py)
      → sharded output + manifest      (sinks/shards.py)

Run:  python examples/curate_corpus.py [sf_dir]   (default sf0.001)

Prints one funnel line per stage plus the final per-split/bin summary.
Every stage is lazy column algebra over one DataFrame lineage — the
only materializations are the dedup pair set (checkpointed, reused by
components) and the final counts.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.operators import (  # noqa: E402
    bpe,
    chunking,
    decontam,
    dedup,
    dsir,
)
from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import (  # noqa: E402
    assemble_bins,
    pack_greedy,
    pack_stats,
)
from topn_clashroyal_etl_sql_snapshot_spark.operators.profile import (  # noqa: E402
    corpus_profile,
)
from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (  # noqa: E402
    hash_sample,
    per_group_cap,
    split_by_component,
)
from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (  # noqa: E402
    lang_id_table,
    repetition_stats,
)
from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.sinks import shards  # noqa: E402
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import (  # noqa: E402
    read_testdata,
)


def curate(spark, sf_dir: str, budget: int = 2048):
    docs = read_testdata(spark, sf_dir, "documents")
    # one-pass corpus telemetry before any gate (the go/no-go report)
    prof = corpus_profile(docs).collect()[0]
    n_all = prof["docs"]
    print(
        f"0_all            {n_all}  "
        f"(avg_chars={prof['avg_chars']:.0f} dup_rate={prof['dup_rate']:.3f} "
        f"pct_und={prof['pct_und']:.3f} q_mean={prof['quality_mean']:.3f})"
    )

    # Text hygiene then PII scrub — projections that rewrite text,
    # drop nothing: NFC normalization (canonical equivalence, so
    # é-composed and é-decomposed dedup identically), control/zero-
    # width strip + space normalization, then redaction.
    docs = cl.normalize_unicode_text(docs)
    docs = docs.withColumn("text", cl.scrub_pii(cl.clean_text(F.col("text"))))

    # Language + quality gates.
    flagged = lang_id_table(docs).filter(F.col("predicted_lang") != "und")
    flagged = flagged.filter(tx.quality_score(F.col("text")) >= 0.5)
    n_quality = flagged.count()
    print(f"1_lang_quality   {n_quality}")

    # Repetition gate (Gopher-style thresholds).
    rep = repetition_stats(docs)
    keep_rep = rep.filter(
        (F.col("dup_line_char_frac") <= 0.3)
        & (F.col("top_bigram_char_frac") <= 0.5)
    ).select("doc_id")
    flagged = flagged.join(keep_rep, "doc_id", "left_semi")
    n_rep = flagged.count()
    print(f"2_repetition     {n_rep}")

    # Near-dup dedup: MinHash-LSH pairs → connected components → keep
    # ONE representative per component. The canonical is the min doc_id
    # among the component's GATE SURVIVORS — picking the global min
    # would delete a whole cluster whenever its min-id member had
    # already failed a quality gate, losing content for no reason.
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
    n_dedup = flagged.count()
    print(f"3_dedup          {n_dedup}")

    # Benchmark decontamination: drop any document sharing an 8-gram
    # with the held-out eval slice (here: every 20th doc_id stands in
    # for the benchmark suite; in production this is the eval set).
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    hits = decontam.contamination_hits(docs, bench, n=8)
    flagged = flagged.join(hits.select("doc_id"), "doc_id", "left_anti")
    n_decon = flagged.count()
    print(f"4_decontam       {n_decon}")

    # Domain targeting (DSIR): fit a hashed-ngram importance model —
    # target = a deterministic sample of the sources whose style the
    # recipe wants more of (stand-ins for a wiki/books exemplar set),
    # raw = a sample of the whole corpus — then keep 80% of the
    # decontaminated survivors by Gumbel top-k (sampling without
    # replacement ∝ exp(importance)). Both fit inputs are hash samples:
    # replayable, and the fit cost is bounded regardless of corpus size.
    survivors = docs.join(flagged.select("doc_id"), "doc_id", "left_semi")
    target = hash_sample(
        docs.filter(F.col("source").isin("src0", "src1", "src2")), "doc_id", 0.5
    )
    raw_sample = hash_sample(docs, "doc_id", 0.5)
    imp_model = dsir.fit_hashed_importance(target, raw_sample, n_buckets=1 << 14)
    scored = dsir.importance_logweights(survivors, imp_model)
    k_keep = max(1, int(n_decon * 0.8))
    selected = dsir.importance_resample(scored, k_keep, seed=13)
    flagged = flagged.join(selected.select("doc_id"), "doc_id", "left_semi")
    n_dsir = flagged.count()
    print(f"5_dsir_select    {n_dsir}")

    # Deterministic split + per-source cap + packing. The split keys on
    # the near-dup COMPONENT label (split_by_component), not the doc
    # id: the kept representative inherits its cluster's split, so if a
    # later run's gates pick a DIFFERENT member of the same cluster as
    # keeper, it still lands on the same side of the eval fence —
    # replay-stable and leakage-safe across gate-threshold changes.
    kept = docs.join(flagged.select("doc_id"), "doc_id", "left_semi")
    kept = split_by_component(
        kept, comp, {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    kept = per_group_cap(
        kept, ["split", "source"], [F.desc("n_chars"), F.asc("doc_id")], k=50
    )

    # per-split DOCUMENT counts (chunking below multiplies rows, so the
    # funnel's doc accounting is taken here, at the last doc-grain stage)
    split_docs = {
        r["split"]: r["n"]
        for r in kept.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # Tokenize with a real byte-level BPE (trained on a deterministic
    # sample of this corpus) so bins are budgeted in actual tokens, not
    # the n_chars proxy.
    merges = bpe.train_bpe_sampled(kept, n_merges=256, sample_fraction=0.2)
    encoded = bpe.bpe_encode_text(kept, merges)

    # Window long documents into bounded training chunks BEFORE packing
    # (a doc longer than the context budget can't enter a bin whole):
    # exact per-chunk token counts come straight off the id slices, and
    # (doc_id, chunk_idx) keeps provenance. chunk_by_tokens drops the
    # id arrays from its output by default — only the counts flow on.
    chunked = chunking.chunk_by_tokens(encoded, size=512, overlap=64)
    # the packer consumes only n_tokens — packing on the NARROW frame
    # keeps the id arrays out of its (split, source) window exchange;
    # assembly joins them back afterwards by chunk identity
    chunk_meta = chunked.drop("chunk_ids")
    n_chunks = chunk_meta.count()
    print(f"6_chunked        {n_chunks}  (from {sum(split_docs.values())} docs)")

    packed = pack_greedy(
        chunk_meta,
        ["split", "source"],
        [F.asc("doc_id"), F.asc("chunk_idx")],
        "n_tokens",
        budget=budget,
    )
    summary = (
        pack_stats(packed, ["split", "source"], "n_tokens", budget)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("bins"),
            F.sum("docs").alias("chunks"),
            F.round(F.avg("fill_rate"), 3).alias("avg_fill"),
        )
        .orderBy("split")
    )
    print("7_packed (split, bins, chunks, avg_fill):")
    rows = summary.collect()
    for r in rows:
        print(f"    {r['split']:6s} {r['bins']:6d} {r['chunks']:6d} {r['avg_fill']}")

    # Assemble each bin into a loader-ready SEQUENCE (concatenated
    # token ids + doc_lens boundary metadata for attention/loss-mask
    # resets), re-joining the id arrays the packer didn't carry, then
    # write the sequences as training shards keyed on bin identity —
    # a bin is one training sequence; its row must live in one shard.
    sequences = assemble_bins(
        packed.join(
            chunked.select("doc_id", "chunk_idx", "chunk_ids"),
            ["doc_id", "chunk_idx"],
        ),
        ["split", "source"],
        ["doc_id", "chunk_idx"],
    )
    shard_dir = tempfile.mkdtemp(prefix="curated_shards_")
    shards.write_training_shards(
        sequences,
        shard_dir,
        key=F.concat_ws("|", "split", "source", F.col("bin_id")),
        n_shards=8,
        weight_col="n_tokens",
    )
    mrows = shards.read_manifest(spark, shard_dir).collect()
    n_shards_written = len(mrows)
    n_sequences = sum(r["n_rows"] for r in mrows)
    print(
        f"8_shards         {n_shards_written} shards at {shard_dir}  "
        f"(sequences={n_sequences}, "
        f"tokens={sum(r['n_weight'] for r in mrows)})"
    )
    return {
        "all": n_all,
        "lang_quality": n_quality,
        "repetition": n_rep,
        "dedup": n_dedup,
        "decontam": n_decon,
        "dsir": n_dsir,
        "chunks": n_chunks,
        "splits": split_docs,
        "packed_chunks": {r["split"]: r["chunks"] for r in rows},
        "shard_dir": shard_dir,
        "shards": n_shards_written,
        "sequences": n_sequences,
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curate-example")
    curate(spark, sf_dir)
    spark.stop()
