"""Document chunking: split long documents into bounded training
chunks with overlap — the stage between extraction/cleaning and
sequence packing (a 200k-char web page cannot enter a 4k-token
context; every pretraining pipeline windows it first).

No reference analog; training-pipeline extension mandate.

Two variants, same windowing scheme:

- :func:`chunk_by_chars` — pure column algebra over the text itself
  (``sequence`` → ``explode`` → ``substring``), fully inside
  whole-stage codegen, no Python, no shuffle. The right tool before
  tokenization (or when budgets are char-denominated).
- :func:`chunk_by_tokens` — the same windowing over a token-id array
  column (``operators/bpe.py::bpe_encode_text`` output), slicing with
  column-argument ``F.slice`` so chunk boundaries are exact token
  counts. Chunks re-enter ``packing.pack_greedy`` with ``n_tokens``
  as the budget column.

Windowing contract (both variants, pinned by a DuckDB oracle in
tests/test_chunking.py): ``step = size - overlap``; chunk k covers
positions ``[1 + k*step, 1 + k*step + size)`` (1-based);
``n_chunks = 1 + ceil(max(n - size, 0) / step)`` — full coverage,
exactly ``overlap`` units shared between consecutive chunks, the last
chunk may be shorter but is never empty, and a document at most
``size`` long yields exactly one chunk (empty/NULL-safe: empty text
yields one empty chunk, NULL text yields no rows — explode of a NULL
sequence).

Scale: one row explodes into ``ceil(n/step)`` rows — a narrow
generator inside the scan stage, no shuffle; downstream grouping
(packing) shuffles on its own keys as before. Chunk identity
``(doc_id, chunk_idx)`` is deterministic, so reruns and incremental
appends produce identical chunk keys (the same replayability contract
as ``sampling.with_split``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _n_chunks(n, size: int, step: int):
    return 1 + F.ceil(F.greatest(n - size, F.lit(0)).cast("double") / step).cast(
        "long"
    )


def chunk_by_chars(
    docs: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    chunk_col: str = "chunk_text",
    keep_source: bool = False,
) -> DataFrame:
    """One output row per chunk: the input columns MINUS ``text_col``
    (each exploded row carrying the full source text would ship
    O(n²/step) bytes per document into every downstream shuffle — a
    200k-char page at size 4096 is ~49 rows × 200 KB ≈ 10 MB through
    the packer's exchange; ``(doc_id, chunk_idx)`` reconstructs
    provenance, and ``keep_source=True`` opts back in) plus
    (chunk_idx, chunk_col, chunk_chars)."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap} / {size}")
    step = size - overlap
    n = F.length(F.col(text_col))
    # NULL text → NULL sequence → explode drops the row entirely
    # (Spark's `greatest` SKIPS nulls, so without the guard a NULL doc
    # would emit one all-NULL chunk row instead of none).
    ks = F.when(
        F.col(text_col).isNotNull(),
        F.sequence(F.lit(0), _n_chunks(n, size, step) - 1),
    )
    out = docs.withColumn("chunk_idx", F.explode(ks))
    # Column.substr takes Column positions (F.substring needs literals)
    chunk = F.col(text_col).substr(
        F.col("chunk_idx").cast("int") * step + 1, F.lit(size)
    )
    out = out.withColumn(chunk_col, chunk).withColumn(
        "chunk_chars", F.length(chunk)
    )
    return out if keep_source else out.drop(text_col)


def chunk_by_tokens(
    docs: DataFrame,
    size: int,
    overlap: int = 0,
    ids_col: str = "token_ids",
    chunk_col: str = "chunk_ids",
    keep_source: bool = False,
) -> DataFrame:
    """One output row per chunk of the token-id array: the input
    columns MINUS ``ids_col`` (same O(n²/step) shuffle-bloat argument
    as :func:`chunk_by_chars`; ``keep_source=True`` opts back in) plus
    (chunk_idx, chunk_col, n_tokens). ``n_tokens`` is the chunk's
    exact token count — feed it straight to
    ``packing.pack_greedy(..., "n_tokens", budget)``. An existing
    ``n_tokens`` column (as emitted by ``bpe_encode_text``) is
    replaced by the per-chunk count."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap} / {size}")
    step = size - overlap
    n = F.size(F.col(ids_col))
    ks = F.when(
        F.col(ids_col).isNotNull(),
        F.sequence(F.lit(0), _n_chunks(n, size, step) - 1),
    )
    out = docs.drop("n_tokens").withColumn("chunk_idx", F.explode(ks))
    chunk = F.slice(
        F.col(ids_col), F.col("chunk_idx").cast("int") * step + 1, F.lit(size)
    )
    out = out.withColumn(chunk_col, chunk).withColumn(
        "n_tokens", F.size(chunk)
    )
    return out if keep_source else out.drop(ids_col)


def chunk_by_sentences(
    docs: DataFrame,
    max_chars: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-BOUNDARY chunking: split on sentence enders, then
    greedily group consecutive sentences into chunks of ≤ ``max_chars``
    — the fixed-window variants cut mid-sentence, which retrieval /
    embedding pipelines specifically avoid (a chunk that starts
    mid-thought embeds poorly; this is the standard RAG chunking
    contract).

    Budget semantics = ``pack_greedy``'s, deliberately: a sentence
    whose span crosses the boundary stays in the chunk where it STARTS,
    so a chunk may exceed ``max_chars`` by less than one sentence
    (and a single over-budget sentence is its own over-budget chunk).
    The STRICT no-overflow grouping is inherently sequential (each
    chunk's start depends on every earlier restart) — it cannot be
    floor-of-running-sum window algebra; route pathological docs
    through ``pack_ffd``-style per-doc Python or ``chunk_by_chars``
    if a hard cap matters more than sentence boundaries.

    Sentence boundary = ``[.!?]+`` followed by whitespace (Java-regex
    lookbehind keeps the punctuation with its sentence). Grouping:
    exclusive running char-sum (with +1 per joining space) over a
    doc-keyed window → ``bin = floor(cum / max_chars)``. One doc-keyed
    shuffle (the window), then one groupBy re-assembling chunk text in
    sentence order.

    Returns (id_col, chunk_idx, chunk_text, chunk_chars, n_sentences).
    Empty/NULL text yields no rows (nothing to retrieve). Chunk
    identity is deterministic — same replayability contract as the
    fixed-window variants."""
    if max_chars < 1:
        raise ValueError(f"max_chars must be ≥ 1, got {max_chars}")
    from pyspark.sql import Window as W

    sents = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col(text_col), r"(?<=[.!?])\s+"),
                    lambda s: F.trim(s),
                ),
                lambda s: s != "",
            )
        ).alias("pos", "sent"),
    )
    w = (
        W.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # +1 per preceding sentence accounts for the single joining space
    # re-inserted at assembly, so chunk_chars ≤ max_chars holds for the
    # ASSEMBLED text, not just the sentence-length sum
    cum_before = F.coalesce(
        F.sum(F.length("sent") + 1).over(w), F.lit(0).cast("long")
    )
    binned = sents.withColumn(
        "bin", (cum_before / F.lit(max_chars)).cast("long")
    )
    agg = (
        binned.groupBy("_id", "bin")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "sent"))
            ).alias("_parts")
        )
        .select(
            "_id",
            "bin",
            F.array_join(
                F.transform(F.col("_parts"), lambda p: p["sent"]), " "
            ).alias("chunk_text"),
            F.size("_parts").alias("n_sentences"),
        )
    )
    w2 = W.partitionBy("_id").orderBy("bin")
    return agg.select(
        F.col("_id").alias(id_col),
        (F.row_number().over(w2) - 1).alias("chunk_idx"),
        "chunk_text",
        F.length("chunk_text").alias("chunk_chars"),
        "n_sentences",
    )
