"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out evaluation/benchmark set.

The step every serious training-data pipeline runs before packing:
if a benchmark prompt/answer leaked into the crawl, training on it
invalidates the eval. The standard test (GPT-3 appendix C, PaLM,
Llama) is exact n-gram overlap at n ≈ 8-13: a document is contaminated
if ANY of its word n-grams appears in any benchmark document.

No reference analog (the reference ETL has no corpus surface —
training-pipeline extension mandate); reuses the dedup family's
tokenize/shingle machinery (``dedup.shingle_sets`` /
``dedup.hashed_postings``) so corpus pipelines that already shingled
for near-dup detection pay nothing extra for the corpus side.

Scale design (the asymmetry is the whole point):

- The CORPUS side is the 100 TB stream: one scan → distinct hashed
  n-grams per doc (``hashed_postings`` — the same relation MinHash and
  Jaccard consume, shareable via ``toks``/session caches).
- The BENCHMARK side is small by construction (eval suites are
  thousands of documents, not billions) → its distinct n-gram set is
  **broadcast**, so the overlap join is map-side: zero shuffle of the
  corpus postings, no skew surface (a hot boilerplate n-gram meets
  only the broadcast hash set, never a partitioned join).
- The per-doc hit count groups by doc id, which REUSES the doc-id
  partitioning the shingle window already established — with the join
  broadcast, no exchange sits between shingling and the rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litarrays import lit_doubles

from . import dedup


def benchmark_ngrams(
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """(sh: long) — the DISTINCT hashed word n-grams of the benchmark
    set, deduplicated across benchmark documents (per-doc provenance is
    irrelevant to the contamination test; the distinct keeps the
    broadcast as small as possible)."""
    return (
        dedup.hashed_postings(benchmark, text_col, id_col, n)
        .select("sh")
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_hits) — corpus documents sharing ≥ 1 word n-gram with
    the benchmark set; ``n_hits`` counts the DISTINCT shared n-grams
    (each corpus n-gram is distinct per doc by construction, so a plain
    count after the join is the distinct count).

    Plan: corpus postings ⋈ broadcast(benchmark n-gram set) → groupBy
    doc id. Pass ``toks`` (a ``dedup.token_arrays`` result) to share
    the corpus tokenize with the dedup family."""
    corpus_sh = dedup.hashed_postings(corpus, text_col, id_col, n, toks=toks)
    bench_sh = benchmark_ngrams(benchmark, text_col, id_col, n)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    toks: DataFrame | None = None,
) -> DataFrame:
    """The clean corpus: every input column, minus documents flagged by
    :func:`contamination_hits` (left-anti join on the doc id — the flag
    side is the small output of a broadcast-join rollup, so AQE plans
    this anti join as a broadcast too)."""
    hits = contamination_hits(corpus, benchmark, text_col, id_col, n, toks=toks)
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def contamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_grams_in_span) — the MERGED
    token-position intervals of benchmark overlap per document
    (``span_end`` exclusive): a matched n-gram at token position p
    covers [p, p+n), and overlapping/adjacent covers merge into one
    span. Dropping a 50k-token document for one quoted benchmark
    sentence wastes 49k good tokens — pipelines excise the span
    instead; this is the report that drives the excision (and the
    human audit of WHAT leaked).

    Plan: positional n-grams (the same window-lead stream
    ``shingle_sets`` builds, WITHOUT the distinct — positions matter
    here) → broadcast semi-join against the benchmark n-gram set →
    classic gaps-and-islands interval merge, all window algebra: a
    match opens a new island iff its position exceeds the running max
    span end of earlier matches; islands group to (min start, max
    end). Shuffle budget: the doc-id window partitioning carries from
    the match stream into the island windows and the final group —
    one exchange end to end, benchmark side broadcast."""
    # the positional gram keys come from the SAME recipe as the
    # benchmark's hashed set (dedup._lead_shingles) — a hand copy here
    # drifting from it would silently zero every match (r11 review)
    grams = dedup.positional_hashed_shingles(
        corpus, text_col, id_col, n, toks=toks
    )
    bench_sh = benchmark_ngrams(benchmark, text_col, id_col, n)
    hits = grams.join(F.broadcast(bench_sh), "sh", "left_semi")
    # gaps-and-islands merge shared with exact-substring dedup
    return dedup.merge_position_islands(hits.select("id", "pos"), n, id_col)


def excise_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    toks: DataFrame | None = None,
    out_col: str = "clean_text",
) -> DataFrame:
    """(doc_id, out_col, n_tokens_kept, n_tokens_dropped): every
    corpus document with its contaminated spans REMOVED — the
    keep-the-document alternative to :func:`decontaminate`'s
    drop-the-document.

    Honest caveat on fidelity: the clean text is rebuilt from the
    TOKENIZED stream (surviving tokens joined with single spaces), so
    the excised document carries the normalized token text, not the
    original formatting — the right input for tokenize-next pipelines
    (the usual consumer), not for display. Span semantics come from
    :func:`contamination_spans` (merged [start, end) token intervals).

    Plan: spans explode to their covered (id, pos) positions and the
    token stream left-joins them on that key (linear in tokens +
    covered positions; overlap-safe — r11), per-doc rebuild with ``sort_array`` over
    (pos, tok) structs — grouping stays on the doc id the stream is
    already partitioned by. Documents with no spans pass through
    intact (left join). EVERY corpus document gets an output row:
    docs that produce no token-stream rows re-enter via a final left
    join on the corpus ids (only the id + a has-text flag ship through
    it, never the text) — NULL text keeps a NULL ``out_col``, zero-
    token text an empty one, both with zero counts (without this,
    such docs silently vanished — r6 ADVICE finding)."""
    if toks is None:
        # span detection and excision both need the token stream — one
        # tokenize scan, not two (r11 review finding; the same
        # materialize-once dedup.exact_substring_excise does)
        toks = dedup.token_arrays(corpus, text_col, id_col).localCheckpoint(
            eager=False
        )
    spans = contamination_spans(corpus, benchmark, text_col, id_col, n, toks=toks)
    # excision tail shared with dedup.exact_substring_excise
    return dedup.excise_token_spans(
        corpus, spans, text_col, id_col, toks, out_col
    )


def decontamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    toks: DataFrame | None = None,
) -> DataFrame:
    """One-row removal report: (total_docs, contaminated_docs,
    clean_docs, total_hits, max_hits) — the audit line a pipeline logs
    per benchmark suite before dropping the flagged documents."""
    hits = contamination_hits(corpus, benchmark, text_col, id_col, n, toks=toks)
    totals = corpus.agg(F.count(F.lit(1)).alias("total_docs"))
    flagged = hits.agg(
        F.count(F.lit(1)).alias("contaminated_docs"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).alias("total_hits"),
        F.coalesce(F.max("n_hits"), F.lit(0)).alias("max_hits"),
    )
    return totals.crossJoin(flagged).select(
        "total_docs",
        "contaminated_docs",
        (F.col("total_docs") - F.col("contaminated_docs")).alias("clean_docs"),
        "total_hits",
        "max_hits",
    )


def split_leakage_report(
    docs: DataFrame,
    split_col: str = "split",
    train_label: str = "train",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    toks: DataFrame | None = None,
    max_eval_ngrams: int | None = 5_000_000,
) -> DataFrame:
    """Cross-SPLIT contamination audit: for every non-train split, how
    many of ITS documents share an ``n``-gram with the TRAIN split —
    the eval-integrity check a pipeline runs after
    ``sampling.with_split`` (hash splitting guarantees disjoint DOC
    IDS, but near-duplicate documents that survived dedup leak the
    same CONTENT into both sides, silently inflating eval scores; this
    measures exactly that residue).

    Returns one row per non-train split: (split, eval_docs,
    leaked_docs, leaked_frac, total_shared_ngrams).

    Plan — the broadcast side must be the EVAL slice, never train
    (train is ~98% of a web-scale corpus; ``contamination_hits`` would
    broadcast its 'benchmark' argument, so the obvious composition
    inverts the sizes and OOMs — r8 review finding). Per eval split,
    two map-side passes over the train postings with ZERO train
    shuffle:

    1. ``shared = train_postings ⋉ broadcast(eval n-gram set)`` →
       distinct — the shared-gram set, ≤ the EVAL gram count by
       construction (the distinct aggregates only the semi-filtered
       matched stream, partial map-side);
    2. ``eval_postings ⋉ broadcast(shared)`` → per-doc count.

    Train postings build ONCE before the loop (from the shared
    tokenize when ``toks`` is passed, id-restricted per side) and are
    lazily checkpointed so the 2-3 split iterations reuse the
    materialized stream instead of re-tokenizing ~the whole corpus per
    split. Acting on the report is policy: drop the leaked eval docs
    (never train docs — shrinking train to protect eval inverts the
    trade) or tighten upstream dedup."""
    splits = [
        r[split_col]
        for r in docs.select(split_col).distinct().collect()
        if r[split_col] is not None and r[split_col] != train_label
    ]
    if not splits:
        raise ValueError(
            f"no non-{train_label!r} splits present — nothing to audit"
        )

    def _side_toks(side):
        if toks is None:
            return None
        # a shared token_arrays frame covers the WHOLE corpus —
        # restrict to this side's ids or the other split's rows would
        # pose as its documents
        return toks.join(
            side.select(F.col(id_col).alias("id")), "id", "left_semi"
        )

    train = docs.filter(F.col(split_col) == train_label)
    if train.limit(1).count() == 0:
        # a mistyped train_label would otherwise audit every split
        # against an EMPTY train side and report all-clean — the
        # silent-false-clean failure this module exists to prevent
        # (r11 review finding)
        raise ValueError(
            f"train split {train_label!r} selects no documents — check "
            f"train_label against the values in {split_col!r}"
        )
    # hashed_postings already returns a localCheckpoint — wrapping it
    # again stored every posting block twice (r11 review finding)
    train_sh = dedup.hashed_postings(
        train, text_col, id_col, n, toks=_side_toks(train)
    )
    out = None
    for s in sorted(splits):
        eval_side = docs.filter(F.col(split_col) == s)
        eval_sh = dedup.hashed_postings(
            eval_side, text_col, id_col, n, toks=_side_toks(eval_side)
        )
        eval_distinct = eval_sh.select("sh").distinct()
        if max_eval_ngrams is not None:
            n_sh = eval_distinct.count()
            if n_sh > max_eval_ngrams:
                # eval splits are a FRACTION of the corpus, not
                # eval-suite-sized: at crawl scale their n-gram set is
                # multi-GB and the forced broadcast below would OOM the
                # driver — same fuse contract as
                # semantic_contamination_scores' max_benchmark_rows
                # (r11 review finding)
                raise ValueError(
                    f"split {s!r} has {n_sh} distinct n-grams (> "
                    f"max_eval_ngrams={max_eval_ngrams}); this audit "
                    "broadcasts the eval side — sample the split, raise "
                    "the bound explicitly, or run the audit per shard"
                )
        shared = (
            train_sh.join(
                F.broadcast(eval_distinct), "sh", "left_semi"
            )
            .select("sh")
            .distinct()
        )
        hits = (
            eval_sh.join(F.broadcast(shared), "sh", "left_semi")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        row = (
            eval_side.agg(F.count(F.lit(1)).alias("eval_docs"))
            .crossJoin(
                hits.agg(
                    F.count(F.lit(1)).alias("leaked_docs"),
                    F.coalesce(F.sum("n_hits"), F.lit(0)).alias(
                        "total_shared_ngrams"
                    ),
                )
            )
            .select(
                F.lit(s).alias(split_col),
                "eval_docs",
                "leaked_docs",
                F.when(
                    F.col("eval_docs") > 0,
                    F.col("leaked_docs").cast("double") / F.col("eval_docs"),
                )
                .otherwise(F.lit(0.0))
                .alias("leaked_frac"),
                F.col("total_shared_ngrams").cast("long"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Semantic (embedding-level) decontamination
# ---------------------------------------------------------------------------

def semantic_contamination_scores(
    corpus_emb: DataFrame,
    benchmark_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    max_benchmark_rows: int | None = 200_000,
) -> DataFrame:
    """(id, nearest_bench_id, max_cosine) — each corpus embedding's
    BEST cosine against the benchmark embedding set, the semantic
    analog of :func:`contamination_hits`: n-gram overlap misses a
    paraphrased eval item, but its embedding still sits next to the
    benchmark's (the SemDeDup observation applied across the
    train/eval fence rather than within the corpus).

    Same asymmetry as the n-gram test, same scale design:

    - The CORPUS side is the 100 TB stream — one scan, never shuffled
      on content: the cross join against a **broadcast** benchmark side
      expands map-side, and the per-doc max is a partial aggregation
      that collapses back to one row per doc in the same task (the
      fan-out never reaches an exchange; the final groupBy moves
      already-collapsed (id, best) rows only).
    - The BENCHMARK side is small by construction (eval suites), and
      ``max_benchmark_rows`` is the broadcast fuse: exceeding it
      raises with the bound named rather than silently planning a
      multi-GB broadcast.

    ``nearest_bench_id`` (smallest benchmark id among cosine ties —
    replay-deterministic) names WHICH eval item a flagged document
    resembles: the audit trail reviewers actually need. Cosines are
    rounded to 9 dp like every similarity operator here, with the same
    fixed-order ``F.aggregate`` dot fold, so a DuckDB twin reproduces
    them exactly. NULL-embedding corpus rows score NULL (never
    silently kept as "clean"); NULL benchmark embeddings are dropped.
    A stream can't run this per-doc aggregation shape directly —
    :func:`semantic_score_expr` is the stateless per-row twin for
    streaming ingest, bit-parity pinned against this scorer."""
    from ..functions import vectors as vx

    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    bench = benchmark_emb.filter(F.col(bvec).isNotNull()).select(
        F.col(bid).alias("_bid"),
        F.col(bvec).alias("_bv"),
        F.nullif(vx.norm(F.col(bvec)), F.lit(0.0)).alias("_bn"),
    )
    if max_benchmark_rows is not None:
        n_bench = bench.count()
        if n_bench > max_benchmark_rows:
            raise ValueError(
                f"semantic_contamination_scores refuses to broadcast "
                f"{n_bench} benchmark embeddings (> max_benchmark_rows="
                f"{max_benchmark_rows}); partition the benchmark or raise "
                "the bound explicitly"
            )
    corpus = corpus_emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.nullif(vx.norm(F.col(vec_col)), F.lit(0.0)).alias("_n"),
    )
    scored = corpus.join(
        F.broadcast(bench), F.col("_v").isNotNull(), "left"
    ).withColumn(
        "_cos",
        F.round(
            vx.cosine_prenormed(
                vx.dot(F.col("_v"), F.col("_bv")), F.col("_n"), F.col("_bn")
            ),
            9,
        ),
    )
    # max over struct(cos, -bid) = best cosine, ties to the SMALLEST
    # benchmark id — deterministic under any partitioning. NULL-vector
    # corpus rows survive the left join with a NULL best.
    best = (
        scored.groupBy("_id")
        .agg(
            F.max(
                F.when(
                    F.col("_cos").isNotNull(),
                    F.struct(
                        F.col("_cos").alias("c"),
                        (-F.col("_bid")).alias("nb"),
                    ),
                )
            ).alias("_best")
        )
        .select(
            F.col("_id").alias(id_col),
            (-F.col("_best.nb")).alias("nearest_bench_id"),
            F.col("_best.c").alias("max_cosine"),
        )
    )
    return best


def collect_benchmark_embeddings(
    benchmark_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark_rows: int = 10_000,
) -> list[tuple[int, list[float], float]]:
    """Driver-side (id, vector, norm) triples for
    :func:`semantic_score_expr` — the model-bounded collect the
    stateless twin needs (benchmark suites are small by construction;
    the fuse raises past ``max_benchmark_rows`` instead of silently
    building a giant expression literal). NULL embeddings are dropped
    here, exactly as the batch scorer drops them. The norm is folded
    left-to-right over widened doubles — the SAME IEEE operation order
    as the batch scorer's Spark-side fold, which is what makes the two
    paths bit-identical rather than merely close."""
    import math

    rows = (
        benchmark_emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("v"))
        .limit(max_benchmark_rows + 1)
        .collect()
    )
    if len(rows) > max_benchmark_rows:
        raise ValueError(
            f"collect_benchmark_embeddings refuses > {max_benchmark_rows} "
            "benchmark embeddings (max_benchmark_rows) — the expression "
            "twin is for eval-suite-sized benchmark sets"
        )
    out = []
    for r in rows:
        v = [float(x) for x in r["v"]]
        acc = 0.0
        for x in v:
            acc = acc + x * x
        out.append((r["i"], v, math.sqrt(acc)))
    return out


def semantic_score_expr(
    vec: Column,
    bench: list[tuple[int, list[float], float]],
) -> Column:
    """``struct(nearest_bench_id, max_cosine)`` as a PURE per-row
    column expression against a driver-collected benchmark set
    (:func:`collect_benchmark_embeddings`) — the stateless twin of
    :func:`semantic_contamination_scores`, the same role
    ``minhash_sig_expr`` / ``lsh_buckets_expr`` play for the MinHash
    gate: a Structured Streaming ingest cannot run the batch scorer's
    per-doc aggregation (a streaming groupBy needs watermark
    machinery a row-level gate doesn't want), but it CAN evaluate an
    expression, so the semantic gate composes with any stream
    unchanged. Bit-parity with the batch path is by construction, not
    tolerance: the same ``vectors.dot`` / ``cosine_prenormed`` folds
    over the same widened doubles, the same 9-dp round, and the same
    (cosine DESC, bench id ASC) tie-break via max-of-struct — pinned
    exactly in tests. NULL / zero-norm rows on either side yield NULL
    scores (never a silent "clean"). The benchmark rides the plan as
    an array-of-structs literal (rows × dim literal doubles — the
    collector's fuse keeps that an eval-suite size).

    Use this ONLY where a stream forbids aggregation: for batch
    scoring the broadcast-join scorer is the fast path — an
    interleaved m3 A/B at sf0.1 (100 bench × 64 dims, 1900 corpus
    rows) read batch 1.86 s vs expr 12.64 s, because the interpreted
    HOF re-walks the literal per corpus row while the join form
    evaluates each (row, bench) pair once against broadcast data."""
    from ..functions import vectors as vx

    if not bench:
        # an empty benchmark scores every row NULL (nothing to hit) —
        # and a zero-arg array literal has no element type to fold over
        return F.struct(
            F.lit(None).cast("long").alias("nearest_bench_id"),
            F.lit(None).cast("double").alias("max_cosine"),
        )
    blit = F.array(
        *[
            F.struct(
                F.lit(int(bid)).cast("long").alias("bid"),
                lit_doubles(bv).alias("bv"),
                F.lit(float(bn)).alias("bn"),
            )
            for bid, bv, bn in bench
        ]
    )
    # vx.norm IS this exact fold — one definition, so the batch scorer
    # and this expression twin stay bit-parity by construction
    nrm = F.nullif(vx.norm(vec), F.lit(0.0))
    scored = F.filter(
        F.transform(
            blit,
            lambda b: F.struct(
                F.round(
                    vx.cosine_prenormed(
                        vx.dot(vec, b["bv"]), nrm, F.nullif(b["bn"], F.lit(0.0))
                    ),
                    9,
                ).alias("c"),
                (-b["bid"]).alias("nb"),
            ),
        ),
        lambda s: s["c"].isNotNull(),
    )
    best = F.array_max(scored)
    return F.struct(
        (-best["nb"]).alias("nearest_bench_id"),
        best["c"].alias("max_cosine"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    corpus_emb: DataFrame,
    benchmark_emb: DataFrame,
    threshold: float = 0.95,
    doc_id_col: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark_rows: int | None = 200_000,
) -> DataFrame:
    """The semantically clean corpus: every ``corpus`` column, minus
    documents whose embedding scores ``max_cosine >= threshold``
    against any benchmark embedding (``corpus_emb.vec_id`` is the
    document's ``doc_id`` — the testdata convention). Same anti-join
    shape as :func:`decontaminate`; the flag side is the small output
    of the broadcast scoring rollup, so AQE broadcasts the anti join
    too. Documents with no embedding row (or a NULL embedding) are
    KEPT — run the n-gram test alongside; absence of an embedding is
    not evidence of cleanliness, and the two tests are complementary
    by design."""
    flagged = (
        semantic_contamination_scores(
            corpus_emb,
            benchmark_emb,
            id_col=id_col,
            vec_col=vec_col,
            max_benchmark_rows=max_benchmark_rows,
        )
        .filter(F.col("max_cosine") >= F.lit(threshold))
        .select(F.col(id_col).alias(doc_id_col))
    )
    return corpus.join(flagged, doc_id_col, "left_anti")
