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
