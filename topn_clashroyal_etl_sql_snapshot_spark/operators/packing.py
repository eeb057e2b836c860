"""Sequence packing: assemble documents into fixed-token-budget
training sequences.

The last assembly step of an LLM data pipeline — after dedup, quality
filtering, and sampling (operators/dedup.py, sampling.py), documents
are concatenated into sequences of ≤ ``budget`` tokens for training.
(The reference has no analog; its terminal step is warehouse INSERTs,
scripts/etl_snapshot_topn.py:289-338. This extends the pipeline the
same way the dedup/similarity operators do.)

Two packers with different fill/compute trade-offs:

- :func:`pack_greedy` — contiguous next-fill in a deterministic
  document order: ``bin = floor(exclusive_cumsum(tokens) / budget)``.
  Pure window algebra (codegen, one shuffle on the group key), and
  SQL-mirrorable, so DuckDB can oracle-check it bit-for-bit. Bins can
  overflow by at most one document (a document whose span crosses the
  boundary stays in the bin where it starts — standard greedy-fill
  semantics, deterministic and splitting-free).
- :func:`pack_ffd` — first-fit-decreasing inside each group via
  ``applyInPandas``: tighter fills (classic FFD ≤ 11/9·OPT + 6/9 bins)
  and a hard cap (no bin exceeds the budget unless a single document
  alone does). Python is justified here the same way it is for the
  multimodal decoders: bin state is inherently sequential per group,
  inexpressible as window algebra.

Scale: both pack WITHIN ``group_cols`` (shard key, split, source…) —
one exchange on the group key, per-group work bounded by the group's
document count. An unsharded global pack would serialize into a single
window partition / a single FFD call, so ``group_cols`` is required;
for a corpus with no natural shard, key by
``sampling.bucket_expr(id) % n_shards`` — packing quality is
per-sequence, so sharding costs nothing but boundary slack per shard.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_greedy(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    token_col: str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Adds ``bin_col``: contiguous greedy fill in ``order_cols`` order
    within each group (make the ordering total — include a unique
    tiebreaker — or assignment is nondeterministic). One exchange on
    the group key; the window's running sum is the only state."""
    if budget < 1:
        raise ValueError(f"budget must be ≥ 1, got {budget}")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(bin_col, (cum_before / budget).cast("long"))


def pack_stats(
    packed: DataFrame,
    group_cols: Sequence[str],
    token_col: str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Per-bin fill statistics: (group, bin, docs, tokens, fill_rate).
    One partial+final aggregate on (group, bin)."""
    return packed.groupBy(*group_cols, bin_col).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_col).cast("long").alias("tokens"),
        (F.sum(token_col) / F.lit(budget)).alias("fill_rate"),
    )


def pack_ffd(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    token_col: str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """First-fit-decreasing per group: documents sorted by (tokens desc,
    id) each go to the lowest-numbered bin with room; a document larger
    than the budget gets a bin of its own. Deterministic — assignment
    is a pure function of the group's (id, tokens) set, independent of
    partitioning. Returns (group_cols…, id_col, tokens long, bin_col).

    ``applyInPandas`` shuffles once on the group key; state per group
    is one int per open bin. FFD is O(n log n) per group with the
    linear remaining-capacity scan bounded by bins ≪ docs in practice
    (tight fills close bins fast)."""
    if budget < 1:
        raise ValueError(f"budget must be ≥ 1, got {budget}")
    group_cols = list(group_cols)
    schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            df.schema[id_col],
            T.StructField("tokens", T.LongType()),
            T.StructField(bin_col, T.LongType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        remaining: list[int] = []  # remaining capacity per open bin
        bins: list[int] = []
        for tok in pdf[token_col].astype(int):
            for b, room in enumerate(remaining):
                if tok <= room:
                    remaining[b] = room - tok
                    bins.append(b)
                    break
            else:
                remaining.append(max(budget - tok, 0))
                bins.append(len(remaining) - 1)
        out = pdf[group_cols + [id_col]].copy()
        out["tokens"] = pdf[token_col].astype("int64").to_numpy()
        out[bin_col] = pd.array(bins, dtype="int64")
        return out

    return df.select(*group_cols, id_col, token_col).groupBy(*group_cols).applyInPandas(
        fit, schema
    )


def assemble_bins(
    packed: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    ids_col: str = "chunk_ids",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Materialize packed bins into TRAINING SEQUENCES: one row per
    (group, bin) with the concatenated token ids and the per-document
    boundary metadata a loader needs to reset attention/loss masks at
    document joins (the standard packed-pretraining contract — without
    ``doc_lens`` the trainer cannot avoid cross-document attention).

    Returns group_cols + (bin_col, input_ids: array, n_tokens, n_docs,
    doc_lens: array) where ``doc_lens[i]`` is the i-th packed chunk's
    length in ``input_ids`` order (``posexplode(doc_lens)`` rebuilds
    offsets; Σ doc_lens = n_tokens by construction).

    Determinism: chunks collect as (order_cols…, ids) STRUCTS and sort
    BEFORE flattening — ``collect_list`` order is partition-dependent,
    so the sort inside the row is what makes two runs byte-identical
    (make ``order_cols`` total, same contract as :func:`pack_greedy`).
    ``order_cols`` must be PLAIN columns/names, ascending (they become
    struct fields for ``array_sort`` — a ``F.asc()``/``F.desc()``
    SortOrder is not a value and is rejected here; the packer's fill
    order is ascending by convention anyway). Plan: ONE groupBy on
    (group, bin) — the same key the packer shuffled on — then pure
    array algebra (sort/transform/flatten) in the projection; no
    second shuffle, no Python, no window."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty (see pack_greedy)")
    ocols = []
    for c in order_cols:
        col = F.col(c) if isinstance(c, str) else c
        # detect a SortOrder expression precisely (its string form ends
        # with the direction + null-ordering tokens) — a bare substring
        # test would reject legitimate columns NAMED e.g. 'ASCII_rank'
        # (review finding)
        rendered = str(col)
        if rendered.rstrip("'>").endswith(
            ("NULLS FIRST", "NULLS LAST", " ASC", " DESC")
        ):
            raise ValueError(
                f"order_cols entry {col} is a SortOrder — pass the bare "
                "column; assemble_bins sorts ascending by construction"
            )
        ocols.append(col)
    bundle = F.struct(*ocols, F.col(ids_col).alias("_ids"))
    agg = packed.groupBy(*group_cols, bin_col).agg(
        F.array_sort(F.collect_list(bundle)).alias("_chunks")
    )
    sorted_ids = F.transform(F.col("_chunks"), lambda c: c["_ids"])
    return agg.select(
        *group_cols,
        bin_col,
        F.flatten(sorted_ids).alias("input_ids"),
        F.size(F.flatten(sorted_ids)).alias("n_tokens"),
        F.size("_chunks").alias("n_docs"),
        F.transform(sorted_ids, lambda ids: F.size(ids)).alias("doc_lens"),
    )
