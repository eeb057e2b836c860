"""As-of (point-in-time) join as a pure DataFrame composition.

Spark has no native ASOF JOIN; the naive formulations are a range
``theta``-join (quadratic per key) or a per-key ``applyInPandas``
merge (Python in the hot path). This operator uses the union-window
trick instead: tag both sides, union them, sort each key's timeline
once, and let ``last(..., ignorenulls=True)`` carry the most recent
right-side row forward onto every left row. One shuffle (the window's
key partitioning), whole-stage codegen throughout, no UDFs.

The matched right row rides in a single struct so all its columns come
from the SAME row even when some of its fields are null — per-column
``last(ignorenulls)`` would splice fields from different rows.

Scale: the exchange is on ``by_cols`` (instrument, user, sensor…)
whose cardinality provides the parallelism; each key's timeline is
processed sequentially inside its partition, which is the operator's
semantics (an ordered merge), not an implementation accident. A key
hot enough to dominate a partition is the same skew as any windowed
op — AQE skew handling and/or time-bucketed pre-splits apply.

The reference has no temporal joins (its only join keys are content
hashes, queries/*.sql); this is part of the training-pipeline
extension surface, alongside sessionization (operators/sessionize.py):
aligning events with the latest metadata/model snapshot at event time.

Verification: tests/test_asof.py checks against DuckDB's native
``ASOF JOIN`` on the same data — an independent engine's
implementation of the same semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right row with the largest
    ``ts_col`` ≤ the left's (``direction="backward"``; ``"forward"``
    matches the smallest ≥) within the same ``by_cols`` key.

    - ``value_cols``: right columns to attach (default: all non-key,
      non-ts columns); each lands as ``<name><suffix>``, plus
      ``<ts_col><suffix>`` for the matched timestamp. No match → nulls.
    - ``tolerance``: max allowed ``|left.ts - matched.ts|`` (same units
      as ``ts_col``'s type arithmetic); matches farther away are nulled.
    - Ties: a right row at exactly the left row's timestamp matches.
      Equal-timestamp right rows within one key are ordered by the
      value struct for a deterministic (if arbitrary) winner; give
      timestamps a tiebreaker column upstream if that matters.
    - Left rows with a NULL timestamp never match (they sort before
      every real timestamp under Spark's nulls-first ascending order,
      where no right row has been seen yet — and symmetrically under
      the forward direction's nulls-last descending order).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by_cols = list(by_cols)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by_cols, ts_col)]
    value_cols = list(value_cols)

    # the matched row travels as one atomic struct (ts first, then values)
    r_struct = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r_tagged = right.select(
        *by_cols,
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        r_struct.alias("_match"),
    )
    l_tagged = left.select(
        "*",
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_tagged.schema["_match"].dataType).alias("_match"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # backward: ascending time, right rows before left at equal ts so a
    # same-instant right row is visible; forward: the mirror image.
    if direction == "backward":
        order = [F.col(ts_col).asc_nulls_first(), F.col("_is_left").asc(), F.col("_match").asc()]
    else:
        order = [F.col(ts_col).desc_nulls_first(), F.col("_is_left").asc(), F.col("_match").desc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_m", F.last("_match", ignorenulls=True).over(w))

    out = carried.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        gap = (
            F.col(ts_col) - F.col("_m._ts")
            if direction == "backward"
            else F.col("_m._ts") - F.col(ts_col)
        )
        out = out.withColumn("_m", F.when(gap <= tol, F.col("_m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_m._ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by_cols: Sequence[str] = (),
    bucket_width: int | float = 1,
    how: str = "inner",
) -> DataFrame:
    """Join points to the intervals containing them
    (``start ≤ ts ≤ end``) without a range theta-join.

    Spark plans a plain range predicate as BroadcastNestedLoopJoin or a
    per-key cartesian — quadratic. The bucketed form is the standard
    bin-hint technique: a point lands in exactly ONE time bucket
    (``floor(ts / width)``); each interval is exploded to the buckets
    its span covers; the join is then an ordinary equi-join on
    ``(by_cols…, bucket)`` with the exact range predicate as a post-
    filter. No duplicates by construction (one bucket per point).

    ``bucket_width`` trades explode fan-out against join selectivity:
    each interval produces ``span/width + 1`` rows, and each bucket
    pairs its points with its candidate intervals. Set it near the
    TYPICAL interval span so typical intervals explode to ~2 buckets;
    a pathologically long interval costs rows linear in its span — cap
    interval length upstream if the distribution is heavy-tailed.
    ``how="left"`` keeps unmatched points with null interval columns
    (one row per point: deduplicated by construction, the anti-join
    side re-attached).

    Equi-key path stays whole-stage-codegen'd; one shuffle per side on
    the (keys, bucket) join key.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    by_cols = list(by_cols)
    width = F.lit(bucket_width)
    p = points.withColumn("_bucket", F.floor(F.col(ts_col) / width))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / width), F.floor(F.col(end_col) / width)
            )
        ),
    )
    joined = p.join(i, [*by_cols, "_bucket"]).filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    out_cols = [
        *[F.col(c) for c in points.columns],
        *[F.col(c) for c in intervals.columns if c not in (*by_cols,)],
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    missing = points.join(
        matched.select(*points.columns).distinct(), points.columns, "left_anti"
    )
    return matched.unionByName(missing, allowMissingColumns=True)
