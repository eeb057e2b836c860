"""Gap-sessionization semantics: boundary inclusivity, per-user
isolation, deterministic tie-breaks."""

from __future__ import annotations

from datetime import datetime, timedelta

from topn_clashroyal_etl_sql_snapshot_spark.operators import sessionize


def _ts(minutes):
    return datetime(2026, 1, 1) + timedelta(minutes=minutes)


def test_session_boundaries(spark):
    rows = [
        # user 1: events at 0, 10, 40(=exactly 30min gap → SAME session),
        # 75 (35min gap → new session)
        (1, 100, _ts(0)),
        (1, 101, _ts(10)),
        (1, 102, _ts(40)),
        (1, 103, _ts(75)),
        # user 2: single event → one singleton session
        (2, 200, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    ids = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize.with_session_ids(df, gap_ms=30 * 60 * 1000).collect()
    }
    assert ids[(1, 100)] == ids[(1, 101)] == ids[(1, 102)] == 1
    assert ids[(1, 103)] == 2
    assert ids[(2, 200)] == 1

    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_ms"])
        for r in sessionize.session_stats(df, gap_ms=30 * 60 * 1000).collect()
    }
    assert stats[(1, 1)] == (3, 40 * 60 * 1000)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 1)] == (1, 0)


def test_sessionize_accepts_timestamp_ntz(spark, tmp_path):
    """Regression (r4): the driver's events.parquet re-typed to
    timestamp[us] isAdjustedToUTC=false, which Spark 4 reads as
    TIMESTAMP_NTZ — unix_millis rejects NTZ, so sessionize must cast
    defensively AND read_testdata must normalize to TIMESTAMP."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from topn_clashroyal_etl_sql_snapshot_spark.sources import readers

    sf_dir = str(tmp_path)
    tbl = pa.table(
        {
            "event_id": pa.array([100, 101, 103], pa.int64()),
            "ts": pa.array(
                [_ts(0), _ts(10), _ts(75)],
                pa.timestamp("us"),  # no tz → isAdjustedToUTC=false → NTZ
            ),
            "user_id": pa.array([1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))

    df = readers.read_testdata(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"

    # And the operator itself tolerates a raw NTZ column.
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    ids = {
        r["event_id"]: r["session_id"]
        for r in sessionize.with_session_ids(raw, gap_ms=30 * 60 * 1000).collect()
    }
    assert ids == {100: 1, 101: 1, 103: 2}
