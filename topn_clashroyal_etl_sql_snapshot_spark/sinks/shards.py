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
  partition pruning without listing the others. The manifest is
  computed from the WRITTEN files read back (r11: computing it from
  the input lineage re-executed the whole upstream as a second job,
  and any nondeterminism upstream would make the manifest describe
  data that was never written — an unresolvable false corruption
  alarm). :func:`write_training_shards_atomic` adds the
  stage-and-swap publish (shared machinery with
  ``snapshot.write_snapshot_atomic``) so a failed write can never
  destroy the previous good shard set.
- **Manifest**: per-shard ``(shard_id, n_rows, n_weight, content_xor,
  weight_col)`` computed in ONE groupBy aggregation over the read-back
  payload. ``content_xor`` is ``bit_xor(xxhash64(*columns,
  null_bitmap))`` — order-independent across ROWS (XOR commutes),
  name-canonical across COLUMNS (sorted), and NULL-position-aware
  (Spark's xxhash64 skips NULL lanes, so without the bitmap a value
  sliding between a column and a NULL neighbor hashed identically —
  r11 review finding). The recorded ``weight_col`` makes verification
  self-describing. The same aggregation re-run at read time is the
  integrity check (:func:`verify_shards`).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


class _AutoWeight:
    """Non-string sentinel for :func:`verify_shards`'s default weight
    semantics — a STRING sentinel ("auto") would collide with a payload
    column literally named ``auto`` (r11 advisor finding): strings
    always name columns, only this object means 'read the manifest'."""

    def __repr__(self) -> str:  # shows as the default in help()/docs
        return "AUTO_WEIGHT"


AUTO_WEIGHT = _AutoWeight()


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
    locality property a round-robin assignment loses). Raises if the
    column already exists: silently replacing it would drop real data
    from the payload AND from the content checksum (r11 review
    finding — e.g. re-sharding read-back shards, where ``shard_id``
    returns as a regular column; drop or rename it explicitly)."""
    if shard_col in df.columns:
        raise ValueError(
            f"input already has a {shard_col!r} column — dropping or "
            "renaming it must be explicit, or its data would silently "
            "vanish from the payload and the checksum"
        )
    return df.withColumn(shard_col, shard_expr(key, n_shards, seed))


def _content_hash(df: DataFrame, exclude: tuple[str, ...]) -> Column:
    # sorted: the hash must not depend on column ORDER (read-back
    # parquet appends partition columns last). The null bitmap makes
    # NULL positions significant — xxhash64 skips NULL lanes, so
    # ('a', NULL) and (NULL, 'a') hashed identically without it.
    cols = sorted(c for c in df.columns if c not in exclude)
    if not cols:
        raise ValueError("no content columns to checksum")
    bitmap = F.concat_ws(
        ",", *[F.col(c).isNull().cast("int").cast("string") for c in cols]
    )
    return F.xxhash64(*[F.col(c) for c in cols], bitmap)


def shard_manifest(
    sharded: DataFrame,
    weight_col: str | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """(shard_id, n_rows, n_weight, content_xor, weight_col) per shard,
    one aggregation. ``n_weight`` sums ``weight_col`` (token counts —
    the number a training loader actually schedules by) or equals
    ``n_rows``; the column NAME rides along so :func:`verify_shards`
    can recompute with the same semantics without the caller having to
    remember them (r11 review finding)."""
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
        .withColumn(
            "weight_col",
            F.lit(weight_col).cast("string"),
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
    and write the manifest to ``path/_manifest/``. The manifest is
    computed from the written files READ BACK — one extra parquet scan
    instead of a second execution of the whole upstream lineage, and
    by construction it describes exactly what is on disk (r11 review
    finding: a nondeterministic upstream used to make the manifest and
    the payload describe different data, an undiagnosable permanent
    verify failure).

    Refuses an EMPTY input: a zero-row partitioned write emits no data
    files and every later read/verify crashes with an
    unable-to-infer-schema error — failing fast at the producer beats
    failing at every consumer (r11 review finding). The overwrite is
    pinned to STATIC partition-overwrite mode so a session-wide
    dynamic setting cannot leave stale shard directories from a
    previous larger write (r11 review finding); it is still an
    in-place destructive overwrite — use
    :func:`write_training_shards_atomic` where a mid-write failure
    must not destroy the previous good generation.

    ``coalesce_shards`` (default True) repartitions on the shard key
    before the write — the small-files guard: a raw
    ``partitionBy(shard)`` write emits one file per (upstream task ×
    shard), and at 100 TB that is 10⁵ tasks × 10³ shards = 10⁸ tiny
    parquet files, a metadata catastrophe for every downstream reader.
    The shard-keyed exchange makes it one task (→ one file) per shard;
    pair it with ``records_per_file`` (Spark's ``maxRecordsPerFile``)
    so a big shard re-splits into bounded files WITHIN its directory
    instead of one monolith. Set ``coalesce_shards=False`` only when
    the input is already clustered by the shard key and the extra
    exchange would be pure waste. Note for the re-write-read-back-
    shards case specifically: ``with_shard`` REFUSES an input that
    already carries ``shard_col`` (silent replacement would drop the
    column from payload and checksum), so drop or rename the read-back
    ``shard_id`` before passing the frame here (r11 advisor finding —
    this docstring used to recommend the flow without that step)."""
    if df.isEmpty():
        raise ValueError(
            "refusing to write an empty shard set: a zero-row "
            "partitioned write emits no data files and every later "
            "read_training_shards/verify_shards would crash on it"
        )
    sharded = with_shard(df, key, n_shards, seed, shard_col)
    if coalesce_shards:
        sharded = sharded.repartition(n_shards, F.col(shard_col))
    writer = sharded.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    )
    if records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(records_per_file))
    writer.partitionBy(shard_col).parquet(path)
    manifest = shard_manifest(
        read_training_shards(df.sparkSession, path, shard_col=shard_col),
        weight_col,
        shard_col,
    )
    manifest.write.mode("overwrite").parquet(os.path.join(path, MANIFEST_DIR))


def write_training_shards_atomic(
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
    """All-or-nothing shard publish: :func:`write_training_shards` into
    ``<path>__staging``, then the shared stage-and-swap
    (``snapshot.atomic_dir_publish`` — same crash-recovery discipline
    as the warehouse snapshot). A failure anywhere before the swap
    leaves the previous complete shard set serving untouched; readers
    see the full old generation or the full new one, never a mix and
    never a payload without its manifest. Local filesystems only (the
    swap is driver-local renames)."""
    from .snapshot import atomic_dir_publish

    atomic_dir_publish(
        path,
        lambda staging: write_training_shards(
            df,
            staging,
            key,
            n_shards,
            seed,
            weight_col,
            shard_col,
            coalesce_shards,
            records_per_file,
        ),
        caller="write_training_shards_atomic",
    )


def read_training_shards(
    spark: SparkSession,
    path: str,
    shard_ids: list[int] | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Read the payload (all shards, or a worker's subset — the filter
    prunes to the named shard directories via partition pruning;
    ``shard_col`` comes back as a partition column). ``shard_col``
    must match the write (r11: it was hardcoded here while the writer
    accepted any name)."""
    df = spark.read.option("basePath", path).parquet(path)
    if shard_ids is not None:
        df = df.filter(F.col(shard_col).isin([int(s) for s in shard_ids]))
    return df


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, MANIFEST_DIR))


def upgrade_manifest(
    spark: SparkSession,
    path: str,
    weight_col: str | None = None,
    shard_col: str = "shard_id",
) -> None:
    """Manifest-ONLY upgrade for shard sets written before the current
    manifest format — the migration path :func:`verify_shards`' loud
    pre-format refusal lacked (r12 advisor finding: the only remedy it
    offered was rewriting the whole payload). Recomputes the manifest
    from the payload and atomically replaces ``path/_manifest``,
    leaving the data files untouched.

    Integrity contract: the old ``content_xor`` is incomparable by
    design (unordered/NULL-blind hash — the reason verification
    refuses), so the re-stamp verifies what IS format-independent
    first: per-shard ``n_rows`` and ``n_weight`` from the stored
    manifest must match the payload exactly (full-outer, so missing or
    extra shards fail too), and the helper raises without writing
    anything if they don't — a payload that fails even the row/weight
    check cannot be trusted enough to re-stamp. ``weight_col`` must
    restate the write-time weight semantics (the pre-format manifest
    did not record it — that omission is what this migrates); it is
    recorded in the new manifest, after which a bare
    ``verify_shards(spark, path)`` works again. Raises on an
    already-current manifest (nothing to migrate — run
    :func:`verify_shards`)."""
    stored = read_manifest(spark, path)
    if "weight_col" in stored.columns:
        raise ValueError(
            f"manifest at {path!r} is already in the current format — "
            "nothing to upgrade; run verify_shards instead"
        )
    actual = shard_manifest(
        read_training_shards(spark, path, shard_col=shard_col),
        weight_col,
        shard_col,
    ).localCheckpoint(eager=True)  # consumed by the check AND the write
    mism = (
        stored.select(
            shard_col,
            F.col("n_rows").alias("stored_rows"),
            F.col("n_weight").alias("stored_weight"),
        )
        .join(
            actual.select(
                shard_col,
                F.col("n_rows").alias("actual_rows"),
                F.col("n_weight").alias("actual_weight"),
            ),
            shard_col,
            "full_outer",
        )
        .filter(
            ~(
                F.col("stored_rows").eqNullSafe(F.col("actual_rows"))
                & F.col("stored_weight").eqNullSafe(F.col("actual_weight"))
                & F.col("stored_rows").isNotNull()
                & F.col("actual_rows").isNotNull()
            )
        )
    )
    bad = mism.limit(5).collect()
    if bad:
        raise ValueError(
            f"upgrade_manifest at {path!r}: stored rows/weights disagree "
            f"with the payload for shards "
            f"{[r[shard_col] for r in bad]} (weight_col={weight_col!r}) — "
            "the payload cannot be trusted enough to re-stamp; if the "
            "weight semantics differ from the write, pass the write-time "
            "weight_col, otherwise rewrite with write_training_shards"
        )
    from .snapshot import atomic_dir_publish

    atomic_dir_publish(
        os.path.join(path, MANIFEST_DIR),
        lambda staging: actual.coalesce(1).write.mode("overwrite").parquet(
            staging
        ),
        caller="upgrade_manifest",
    )


def verify_shards(
    spark: SparkSession,
    path: str,
    weight_col: str | None | _AutoWeight = AUTO_WEIGHT,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Recompute the manifest from the payload on disk and join it
    against the stored manifest: (shard_id, ok, stored_rows,
    actual_rows, stored_xor, actual_xor), full outer so missing or
    extra shards surface as rows with NULLs on one side. ``ok`` is
    row-count + weight + checksum equality, NULL-SAFE (an all-NULL
    weight column sums to NULL on both sides — equal data must verify
    ok, not alarm; r11 review finding). ``weight_col=AUTO_WEIGHT``
    (the default — a non-string sentinel, so a payload column
    literally named "auto" cannot collide with it) reads the weight
    semantics the manifest recorded at write time, so a bare
    ``verify_shards(spark, path)`` can never flag an intact shard set
    just because the caller forgot the write-time weight column (r11
    review finding); pass an explicit name or ``None`` to override.
    One scan of the payload; the integrity decision is ``WHERE NOT
    ok``.

    A manifest WITHOUT the ``weight_col`` column predates the current
    format (which also changed the checksum to sorted-column +
    NULL-bitmap) — its checksums are incomparable with the recomputed
    ones, so verification cannot distinguish corruption from format
    drift; that raises loudly with a rewrite instruction instead of
    crashing on the missing column or reporting an intact shard set as
    corrupted (r11 advisor finding)."""
    stored_manifest = read_manifest(spark, path)
    if "weight_col" not in stored_manifest.columns:
        raise ValueError(
            f"manifest at {path!r} predates the current format (no "
            "weight_col column; its content_xor also used the old "
            "unordered/NULL-blind hash, so a checksum compare would "
            "report intact shards as corrupted) — run "
            "upgrade_manifest(spark, path, weight_col=<write-time "
            "column>) to re-stamp the manifest in place, or rewrite "
            "with write_training_shards"
        )
    if isinstance(weight_col, _AutoWeight):
        wc_rows = stored_manifest.select("weight_col").limit(1).collect()
        weight_col = wc_rows[0]["weight_col"] if wc_rows else None
    actual = shard_manifest(
        read_training_shards(spark, path, shard_col=shard_col),
        weight_col,
        shard_col,
    ).select(
        F.col(shard_col),
        F.col("n_rows").alias("actual_rows"),
        F.col("n_weight").alias("actual_weight"),
        F.col("content_xor").alias("actual_xor"),
    )
    stored = stored_manifest.select(
        F.col(shard_col),
        F.col("n_rows").alias("stored_rows"),
        F.col("n_weight").alias("stored_weight"),
        F.col("content_xor").alias("stored_xor"),
    )
    joined = stored.join(actual, shard_col, "full_outer")
    ok = (
        F.col("stored_rows").eqNullSafe(F.col("actual_rows"))
        & F.col("stored_weight").eqNullSafe(F.col("actual_weight"))
        & F.col("stored_xor").eqNullSafe(F.col("actual_xor"))
        # a side missing entirely (full-outer NULL row) must still fail
        & F.col("stored_rows").isNotNull()
        & F.col("actual_rows").isNotNull()
    )
    return joined.select(
        shard_col,
        F.coalesce(ok, F.lit(False)).alias("ok"),
        "stored_rows",
        "actual_rows",
        "stored_weight",
        "actual_weight",
        "stored_xor",
        "actual_xor",
    ).orderBy(shard_col)
