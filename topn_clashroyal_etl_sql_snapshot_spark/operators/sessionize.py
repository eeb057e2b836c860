"""Gap-based sessionization: assign session ids to an event stream by
inactivity gaps — the standard user-activity shaping step for both
analytics and training-data pipelines (one session ≈ one interaction
trace).

Plan shape: ONE shuffle on the user key serves both window passes (lag
to flag gaps, running sum to number sessions) and the per-session
aggregate — Spark keeps the partitioning across same-key windows, so
sessionizing 100 TB of events costs a single exchange. Timestamps
compare at millisecond precision (``unix_millis``), which both Spark
and DuckDB (``epoch_ms``) compute identically — second-granularity
casts would disagree on sub-second gaps.

The streaming twin of this operator is
``F.session_window(ts, gap)`` in streaming/incremental.py's world —
the batch form here is replayable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_ids(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Adds ``session_id`` (1-based per user): a new session starts at
    the first event and whenever the gap since the previous event
    exceeds ``gap_ms``. Deterministic: ties on ts break by
    ``tiebreak_col``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # Defensive: unix_millis rejects TIMESTAMP_NTZ (Spark 4 reads
    # isAdjustedToUTC=false parquet as NTZ); session TZ is pinned UTC so
    # the cast is value-identical and a no-op for plain TIMESTAMP.
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    is_break = (prev_ms.isNull() | ((ms - prev_ms) > gap_ms)).cast("long")
    running = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_break).over(running))


def session_stats(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_id, n_events, duration_ms) — one row per
    session. Duration is last-minus-first event in ms (0 for singleton
    sessions)."""
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    return (
        with_session_ids(events, gap_ms, user_col, ts_col, tiebreak_col)
        .groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ms) - F.min(ms)).alias("duration_ms"),
        )
    )
