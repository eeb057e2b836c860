"""Snapshot sink: overwrite-mode parquet (and optional JDBC) writer.

The reference loads with TRUNCATE + RELOAD in one transaction
(``scripts/etl_snapshot_topn.py:162-182, 363-527``) — the ETL computes
full snapshots, so ``mode("overwrite")`` is semantically identical and the
upsert logic vanishes (SURVEY.md §2.A5). ``deck_type_overrides`` is manual
config and is never rewritten (scripts:167-179 exclude it).

Scale notes: rollup tables are partitioned by their leading dimension key
where the cardinality warrants it; the big per-player fact is written with
sensible file sizing left to AQE's coalesced shuffle output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_snapshot(
    tables: dict[str, DataFrame],
    warehouse_dir: str,
    partition_keys: dict[str, list[str]] | None = None,
) -> None:
    """Write every table under ``warehouse_dir/<name>/`` in overwrite mode."""
    default_partitioning = {
        # read patterns filter by archetype (dashboard drill-down) —
        # partition pruning replaces the reference's B-tree indexes
        "meta_type_cards": ["deck_type"],
        "meta_type_deck_ids": ["deck_type"],
    }
    pk = {**default_partitioning, **(partition_keys or {})}
    for name, df in tables.items():
        writer = df.write.mode("overwrite")
        if name in pk:
            writer = writer.partitionBy(*pk[name])
        writer.parquet(os.path.join(warehouse_dir, name))


def write_snapshot_jdbc(
    tables: dict[str, DataFrame],
    url: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """Optional JDBC sink mirroring the reference's Postgres load (A5).

    ``mode("overwrite")`` ≡ TRUNCATE + INSERT; batched like the
    reference's executemany batches.
    """
    props = {"batchsize": str(batchsize), **(properties or {})}
    for name, df in tables.items():
        df.write.mode("overwrite").options(**props).jdbc(url, name)


def publish_snapshot_jdbc(
    spark,
    source_url: str,
    target_url: str,
    tables: list[str],
    source_properties: dict[str, str] | None = None,
    target_properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> dict[str, int]:
    """A7: publish the local snapshot to a second database — the
    engine-side equivalent of the reference's ``make publish``
    (``Makefile:89-94``: ``pg_dump`` the snapshot tables locally,
    pipe into ``psql $CLOUD_URL``). Spark replaces the dump/restore
    pipe with a read → overwrite write per table: rows stream through
    executors (never the driver) and overwrite on the target ≡ the
    dump's DROP+CREATE+COPY. By default the source read is ONE JDBC
    connection per table (the same single-pipe shape as pg_dump, with
    the write side still batched); to parallelize the read across
    executors, pass Spark's JDBC partitioning options through
    ``source_properties`` (``partitionColumn``/``lowerBound``/
    ``upperBound``/``numPartitions``, plus ``fetchsize``) — snapshot
    tables with an integer leading key take this directly.

    Returns {table: row_count} counted from the TARGET after each
    write — the accounting reflects what was actually published, and
    the source is read exactly once (counting the lazy source frame
    instead would re-scan it and could disagree with the write under
    concurrent source mutation). Tables are published one by one; a
    mid-list failure leaves earlier tables fully replaced and later
    ones untouched (the reference's shell pipe had the same per-dump
    granularity)."""
    sprops = dict(source_properties or {})
    tprops = dict(target_properties or {})
    counts: dict[str, int] = {}
    for name in tables:
        df = (
            spark.read.format("jdbc")
            .options(url=source_url, dbtable=name, **sprops)
            .load()
        )
        write_snapshot_jdbc(
            {name: df},
            target_url,
            properties=target_properties,
            batchsize=batchsize,
        )
        counts[name] = (
            spark.read.format("jdbc")
            .options(url=target_url, dbtable=name, **tprops)
            .load()
            .count()
        )
    return counts


def publish_warehouse_jdbc(
    spark,
    warehouse_dir: str,
    target_url: str,
    tables: list[str],
    target_properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> dict[str, int]:
    """Publish parquet warehouse tables (``write_snapshot`` output) to
    a serving database — the publish shape when the local snapshot
    store is the lake, not a database; the parquet read parallelizes
    over file splits with no extra options. Same overwrite semantics
    and target-counted row accounting as
    :func:`publish_snapshot_jdbc`."""
    tprops = dict(target_properties or {})
    counts: dict[str, int] = {}
    for name in tables:
        df = spark.read.parquet(os.path.join(warehouse_dir, name))
        write_snapshot_jdbc(
            {name: df},
            target_url,
            properties=target_properties,
            batchsize=batchsize,
        )
        counts[name] = (
            spark.read.format("jdbc")
            .options(url=target_url, dbtable=name, **tprops)
            .load()
            .count()
        )
    return counts
