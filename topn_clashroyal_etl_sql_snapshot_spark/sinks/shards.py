"""Training-shard sink: deterministic sharded parquet output with an
integrity manifest — the hand-off format between the curation pipeline
and a training job's data loader.

No reference analog (the reference's sink is a Postgres snapshot,
scripts/etl_snapshot_topn.py — SURVEY.md §2.A5); this is the
training-pipeline extension surface. A loader wants: (a) a FIXED shard
count it can assign to workers, (b) shard membership that is a pure
function of the data (re-runs and retries produce byte-identical shard
assignment — no ``rand()``, no partition-index dependence), (c) a
manifest to size epochs and verify integrity without re-reading
payloads.

Design:

- **Assignment** (:func:`with_shard`): ``shard_id = pmod(xxhash64(seed,
  key), n_shards)`` — the ``operators/sampling.py`` membership rule.
  Uniform in expectation (±1/√(rows/shard) relative skew — at training
  scale, thousands of rows per shard, the imbalance is sub-percent),
  replayable, append-stable. No global sort, no coordination: the
  assignment is a narrow projection.
- **Write** (:func:`write_training_shards`): one ``partitionBy(shard_id)``
  parquet write — shard directories are Hive-style
  ``shard_id=N/part-*.parquet``, so readers prune to their shard via
  partition pruning without listing the others.
- **Manifest**: per-shard ``(shard_id, n_rows, n_weight, content_xor)``
  computed in ONE groupBy aggregation. ``content_xor`` is
  ``bit_xor(xxhash64(*columns))`` — order-independent (XOR commutes, so
  the checksum is stable under any partitioning/row order) and
  overflow-free (no sum in ANSI mode to trap). The same aggregation
  re-run at read time is the integrity check (:func:`verify_shards`).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def shard_expr(key: str | Column, n_shards: int, seed: int = 42) -> Column:
    """Deterministic shard id in [0, n_shards) — IS
    ``sampling.bucket_expr`` (delegated, not re-implemented, so shard
    assignment can never silently diverge from sample membership)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥ 1, got {n_shards}")
    from ..operators.sampling import bucket_expr

    return bucket_expr(key, seed, n_shards)


def with_shard(
    df: DataFrame,
    key: str | Column,
    n_shards: int,
    seed: int = 42,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Adds ``shard_col``. Rows sharing a key share a shard (documents
    and their chunks co-locate when keyed on doc id — the leakage /
    locality property a round-robin assignment loses)."""
    return df.withColumn(shard_col, shard_expr(key, n_shards, seed))


def _content_hash(df: DataFrame, exclude: tuple[str, ...]) -> Column:
    cols = [c for c in df.columns if c not in exclude]
    if not cols:
        raise ValueError("no content columns to checksum")
    return F.xxhash64(*[F.col(c) for c in cols])


def shard_manifest(
    sharded: DataFrame,
    weight_col: str | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """(shard_id, n_rows, n_weight, content_xor) per shard, one
    aggregation. ``n_weight`` sums ``weight_col`` (token counts — the
    number a training loader actually schedules by) or equals
    ``n_rows``. ``content_xor`` XORs a row hash over EVERY non-shard
    column — any lost, duplicated, or altered row flips it."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        sharded.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(w).alias("n_weight"),
            F.bit_xor(_content_hash(sharded, (shard_col,))).alias("content_xor"),
        )
        .orderBy(shard_col)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str | Column,
    n_shards: int,
    seed: int = 42,
    weight_col: str | None = None,
    shard_col: str = "shard_id",
    coalesce_shards: bool = True,
    records_per_file: int | None = None,
) -> None:
    """Shard-assign, write ``path/shard_id=N/`` parquet directories,
    and write the manifest to ``path/_manifest/``. Two jobs total (the
    payload write and the manifest aggregation); both scale as one
    pass over the data. The manifest is computed from the SAME sharded
    frame that was written, so a later :func:`verify_shards` detects
    any divergence between what the pipeline produced and what is on
    disk.

    ``coalesce_shards`` (default True) repartitions on the shard key
    before the write — the small-files guard: a raw
    ``partitionBy(shard)`` write emits one file per (upstream task ×
    shard), and at 100 TB that is 10⁵ tasks × 10³ shards = 10⁸ tiny
    parquet files, a metadata catastrophe for every downstream reader.
    The shard-keyed exchange makes it one task (→ one file) per shard;
    pair it with ``records_per_file`` (Spark's ``maxRecordsPerFile``)
    so a big shard re-splits into bounded files WITHIN its directory
    instead of one monolith. Set ``coalesce_shards=False`` only when
    the input is already partitioned by the shard key (e.g. re-writing
    read-back shards) and the extra exchange would be pure waste."""
    sharded = with_shard(df, key, n_shards, seed, shard_col)
    if coalesce_shards:
        sharded = sharded.repartition(n_shards, F.col(shard_col))
    writer = sharded.write.mode("overwrite")
    if records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(records_per_file))
    writer.partitionBy(shard_col).parquet(path)
    manifest = shard_manifest(sharded, weight_col, shard_col)
    manifest.write.mode("overwrite").parquet(os.path.join(path, MANIFEST_DIR))


def read_training_shards(
    spark: SparkSession, path: str, shard_ids: list[int] | None = None
) -> DataFrame:
    """Read the payload (all shards, or a worker's subset — the filter
    prunes to the named shard directories via partition pruning;
    ``shard_id`` comes back as a partition column)."""
    df = spark.read.option("basePath", path).parquet(path)
    if shard_ids is not None:
        df = df.filter(F.col("shard_id").isin([int(s) for s in shard_ids]))
    return df


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, MANIFEST_DIR))


def verify_shards(
    spark: SparkSession,
    path: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Recompute the manifest from the payload on disk and join it
    against the stored manifest: (shard_id, ok, stored_rows,
    actual_rows, stored_xor, actual_xor), full outer so missing or
    extra shards surface as rows with NULLs on one side. ``ok`` is
    row-count + weight + checksum equality. One scan of the payload;
    the integrity decision is ``WHERE NOT ok``."""
    actual = shard_manifest(
        read_training_shards(spark, path), weight_col
    ).select(
        F.col("shard_id"),
        F.col("n_rows").alias("actual_rows"),
        F.col("n_weight").alias("actual_weight"),
        F.col("content_xor").alias("actual_xor"),
    )
    stored = read_manifest(spark, path).select(
        F.col("shard_id"),
        F.col("n_rows").alias("stored_rows"),
        F.col("n_weight").alias("stored_weight"),
        F.col("content_xor").alias("stored_xor"),
    )
    joined = stored.join(actual, "shard_id", "full_outer")
    ok = (
        (F.col("stored_rows") == F.col("actual_rows"))
        & (F.col("stored_weight") == F.col("actual_weight"))
        & (F.col("stored_xor") == F.col("actual_xor"))
    )
    return joined.select(
        "shard_id",
        F.coalesce(ok, F.lit(False)).alias("ok"),
        "stored_rows",
        "actual_rows",
        "stored_weight",
        "actual_weight",
        "stored_xor",
        "actual_xor",
    ).orderBy("shard_id")
