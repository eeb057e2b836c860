"""Skew-mitigation operators: salted two-phase aggregation and salted
joins for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these explicit forms are for the cases AQE can't fix:

- a groupBy where one key holds a large fraction of all rows (AQE can
  split a skewed *join* partition, but a hash aggregate still funnels
  one key's partials to one reducer — salting splits the key itself);
- a shuffle join against a dimension too big to broadcast where a few
  fact keys are hot: replicate the dim row per salt instead.

Both are pure DataFrame transforms — deterministic output, salt chosen
by a hash of the whole row (no RNG, replay-safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, buckets): hash of the listed
    columns (default: all) — uniform, stable across retries/replays."""
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*src), F.lit(buckets)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max} (the re-aggregable family; avg = sum/count at
    the caller). Phase 1 groups by (key, salt) — the hot key fans out
    over ``buckets`` reducers; phase 2 re-aggregates per key. Map-side
    partial aggregation already gives most of this when key cardinality
    is high; salting matters when ONE key dominates a partition's output.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    phase1 = with_salt(df, buckets).groupBy(*keys, "_salt").agg(
        *[fns[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[refns[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact[on]`` is skewed and ``dim`` can't be
    broadcast: salt the fact side, replicate each dim row ``buckets``
    times, join on (key, salt). The hot key's rows spread over
    ``buckets`` tasks at the cost of a ``buckets``× dim shuffle.

    Only fact-preserving join types are correct under dim replication —
    with ``right``/``full``, an unmatched dim row would survive once per
    salt replica (``buckets``× duplicates), so those are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports fact-preserving join types only, got {how!r}: "
            "dim rows are replicated per salt, so right/full joins would emit "
            "unmatched dim rows once per replica"
        )
    f = with_salt(fact, buckets, [on] + [c for c in fact.columns if c != on])
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")
