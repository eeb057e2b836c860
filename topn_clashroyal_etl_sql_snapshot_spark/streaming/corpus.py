"""Structured Streaming twin of the corpus-ingest gates.

A training-data pipeline's INGEST half — hygiene, PII scrub, language
and quality gating, exact dedup — runs continuously as documents land;
the heavy corpus-wide passes (near-dup components, decontamination,
packing) stay batch jobs over the accumulated bronze table (they need
corpus-global state that streaming cannot bound). This module gives
the ingest half a streaming form with BATCH PARITY by construction:

- :func:`stream_documents` — file-source stream over a JSONL landing
  zone with the ``documents`` schema.
- :func:`curate_stream` — the gate stack as PURE PROJECTIONS AND
  FILTERS (``cleaning.clean_text`` → ``scrub_pii`` → ``tx.lang_id`` ≠
  'und' → ``quality_score`` ≥ threshold): completely stateless, so
  the SAME function applies to a batch DataFrame unchanged — the
  parity test feeds both sides the same rows
  (tests/test_streaming.py).
- :func:`streaming_dedup_documents` — exact dedup as watermarked
  ``dropDuplicates`` on the normalized content fingerprint:
  first-arrival-wins across micro-batches, state bounded by the
  watermark (the batch twin ``dedup.dedup_exact`` keeps min-id
  instead — deterministic where streaming is arrival-ordered; the
  parity test compares the KEPT FINGERPRINT SET, which is identical).

NFC normalization (``cleaning.normalize_unicode_text``) is mapInPandas
and works on streams too (stateless per row); it is left out of
:func:`curate_stream` only so the gate stack stays one codegen stage —
compose it upstream when the corpus needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cleaning as cl
from ..functions import text as tx

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ingest_time", T.TimestampType()),
    ]
)


def stream_documents(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over the document landing zone (JSONL),
    ``maxFilesPerTrigger`` as the admission valve."""
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )


def curate_stream(
    docs: DataFrame,
    min_quality: float = 0.5,
    lm_model: dict | None = None,
    max_ppl: float | None = None,
    dsir_model: dict | None = None,
    min_logw: float | None = None,
) -> DataFrame:
    """Hygiene → scrub → language gate → quality gate (→ optional LM
    perplexity gate), all stateless column algebra — identical
    semantics on a stream or a batch frame (that identity IS the
    parity test). Adds ``predicted_lang`` and ``quality``; drops
    'und'-language and low-quality rows.

    Pass ``lm_model`` (a ``lm_score.train_char_lm`` /
    ``fit_char_lm_counts`` dict) and ``max_ppl`` to also gate on model
    perplexity: scoring uses ``lm_score.lm_avg_logprob_expr`` — the
    literal-map per-row twin of the batch join plan, exact-parity
    pinned — so the gate stays ONE stateless codegen stage on a
    stream. Documents too short to score (NULL avg) PASS the LM gate:
    the length/quality gates own them, mirroring ``lm_perplexity``'s
    contract. Adds ``avg_logprob``/``ppl`` columns when enabled.

    Pass ``dsir_model`` (a TERM-kind ``dsir.fit_term_importance`` dict)
    and ``min_logw`` to additionally gate on DOMAIN importance at
    ingest: scoring uses ``dsir.logweight_expr`` — the stateless
    literal-map twin of the batch broadcast-join scorer, exact-parity
    pinned — so stream-time domain targeting stays inside the same
    single codegen stage (Gumbel top-k selection is corpus-global and
    stays a batch pass over bronze; a THRESHOLD is the streamable
    form). Adds a ``dsir_logw`` column when enabled."""
    if max_ppl is not None and lm_model is None:
        raise ValueError(
            "max_ppl was set but lm_model is None — the perplexity gate "
            "needs a model; without this check the gate would silently "
            "not exist"
        )
    if min_logw is not None and dsir_model is None:
        raise ValueError(
            "min_logw was set but dsir_model is None — the importance "
            "gate needs a model; without this check the gate would "
            "silently not exist"
        )
    cleaned = docs.withColumn(
        "text", cl.scrub_pii(cl.clean_text(F.col("text")))
    )
    scored = cleaned.withColumn(
        "predicted_lang", tx.lang_id(F.col("text"))
    ).withColumn("quality", tx.quality_score(F.col("text")))
    out = scored.filter(
        (F.col("predicted_lang") != "und") & (F.col("quality") >= min_quality)
    )
    if lm_model is not None:
        from ..operators.lm_score import lm_avg_logprob_expr

        out = out.withColumn(
            "avg_logprob", lm_avg_logprob_expr(lm_model)
        ).withColumn("ppl", F.exp(-F.col("avg_logprob")))
        if max_ppl is not None:
            out = out.filter(
                F.col("ppl").isNull() | (F.col("ppl") <= max_ppl)
            )
    if dsir_model is not None:
        from ..operators.dsir import logweight_expr

        out = out.withColumn("dsir_logw", logweight_expr(dsir_model))
        if min_logw is not None:
            out = out.filter(F.col("dsir_logw") >= min_logw)
    return out


def streaming_dedup_documents(
    docs: DataFrame,
    watermark: str = "2 hours",
    time_col: str = "ingest_time",
) -> DataFrame:
    """Exact streaming dedup: first arrival per normalized content
    fingerprint wins; duplicate state is dropped once the watermark
    passes (a re-crawl of the same page weeks later would re-admit it —
    bound the watermark to the re-crawl horizon, or run the batch
    ``dedup_exact`` over bronze for the corpus-global guarantee).

    ``dropDuplicatesWithinWatermark`` is load-bearing: plain
    ``dropDuplicates(["fingerprint"])`` only evicts state when the
    event-time column is PART OF the dedup subset — with a key-only
    subset its state store grows one entry per distinct fingerprint
    forever, and a long-lived ingest job eventually OOMs. The
    WithinWatermark variant exists precisely for key-only dedup with
    watermark-bounded state."""
    fp = docs.withColumn(
        "fingerprint", tx.content_fingerprint(F.col("text"))
    )
    return fp.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


ANNOTATION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ann_time", T.TimestampType()),
    ]
)


def stream_annotations(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over an annotation landing zone (JSONL):
    (doc_id, score, ann_time) — the async enrichment feed (a scoring
    service emitting toxicity/quality/embedding-distance verdicts per
    document, minutes behind the text feed)."""
    return (
        spark.readStream.schema(ANNOTATION_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )


def join_stream_annotations(
    docs: DataFrame,
    anns: DataFrame,
    max_delay: str = "10 minutes",
    doc_watermark: str = "30 minutes",
    ann_watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM join: each document row pairs with the
    annotation rows for its id that arrive within ``max_delay`` of the
    document's ingest time — the enrichment join of a two-feed ingest
    stack (text lands in one topic, model annotations trail in
    another).

    The event-time RANGE condition is load-bearing, not decoration:
    Spark can only evict stream-stream join state when a watermark plus
    a time bound proves no future match exists — an unbounded equi-join
    on id would buffer both streams forever. With the bound, each
    side's state is ``rate × (watermark + max_delay)`` rows, constant
    in stream lifetime. ``how="left_outer"`` additionally emits
    unmatched documents with NULL annotation columns — but only once
    the watermark passes their join bound, so late tail documents of a
    finite run (availableNow backfills) may never emit their NULL form;
    inner is the default for exactly that determinism reason.

    Both inputs may also be BATCH frames: the condition is plain
    column algebra, so the same function is its own batch twin (the
    parity test feeds both sides identical rows — the
    ``curate_stream`` pattern)."""
    if how not in ("inner", "left_outer", "leftOuter"):
        raise ValueError(
            f"how must be inner/left_outer, got {how!r} — stream-stream "
            "right/full outer would need the mirror-image time bound"
        )
    # each side watermarks on ITS OWN streaming-ness: keying both on
    # docs.isStreaming left a streaming anns side unwatermarked when
    # docs was a batch backfill — an unbounded-state stream-static join
    # (or a start-time failure for left_outer) instead of the
    # documented state-bounded plan (r11 review finding)
    d = (
        docs.withWatermark("ingest_time", doc_watermark)
        if docs.isStreaming
        else docs
    )
    a = (
        anns.withWatermark("ann_time", ann_watermark)
        if anns.isStreaming
        else anns
    )
    d, a = d.alias("d"), a.alias("a")
    cond = (
        (F.col("d.doc_id") == F.col("a.doc_id"))
        & (F.col("a.ann_time") >= F.col("d.ingest_time"))
        & (
            F.col("a.ann_time")
            <= F.col("d.ingest_time") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = d.join(a, cond, how)
    return joined.select(
        F.col("d.doc_id").alias("doc_id"),
        F.col("d.text").alias("text"),
        F.col("d.lang").alias("lang"),
        F.col("d.source").alias("source"),
        F.col("d.ingest_time").alias("ingest_time"),
        F.col("a.score").alias("score"),
        F.col("a.ann_time").alias("ann_time"),
    )
