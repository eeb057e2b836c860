"""As-of join (operators/asof.py) vs DuckDB's native ASOF JOIN — an
independent engine's implementation of the same point-in-time
semantics — plus tolerance, forward direction, and plan shape."""

from __future__ import annotations

import random
import re

import duckdb
import pytest

from topn_clashroyal_etl_sql_snapshot_spark.operators.asof import asof_join


def _data():
    rng = random.Random(42)
    keys = ["a", "b", "c"]
    left = [
        (k, rng.randrange(0, 1000), i) for i, k in enumerate(keys * 40)
    ]
    # unique (key, ts) on the right so the match is uniquely determined
    right_ts = {k: rng.sample(range(0, 1000), 25) for k in keys}
    right = [
        (k, ts, f"{k}-{ts}", ts * 10) for k in keys for ts in right_ts[k]
    ]
    # a key that exists only on the left → all-null matches
    left.append(("zzz", 500, 999))
    return left, right


@pytest.fixture(scope="module")
def frames(spark):
    left, right = _data()
    ldf = spark.createDataFrame(left, "k string, ts long, lid long")
    rdf = spark.createDataFrame(right, "k string, ts long, tag string, px long")
    return ldf, rdf, left, right


def _duck(left, right, cmp: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k VARCHAR, ts BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r (k VARCHAR, ts BIGINT, tag VARCHAR, px BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left)
    con.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", right)
    return {
        row[0]: row[1:]
        for row in con.execute(
            f"""
            SELECT l.lid, r.ts, r.tag, r.px
            FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts {cmp} r.ts
            """
        ).fetchall()
    }


def test_asof_backward_matches_duckdb(spark, frames):
    ldf, rdf, left, right = frames
    got = {
        r["lid"]: (r["ts_right"], r["tag_right"], r["px_right"])
        for r in asof_join(ldf, rdf, "ts", ["k"]).collect()
    }
    assert got == _duck(left, right, ">=")
    assert got[999] == (None, None, None)  # unmatched key


def test_asof_forward_matches_duckdb(spark, frames):
    ldf, rdf, left, right = frames
    got = {
        r["lid"]: (r["ts_right"], r["tag_right"], r["px_right"])
        for r in asof_join(ldf, rdf, "ts", ["k"], direction="forward").collect()
    }
    assert got == _duck(left, right, "<=")


def test_asof_tolerance_and_exact_tie(spark, frames):
    ldf, rdf, left, right = frames
    tol = 50
    got = {
        r["lid"]: r["ts_right"]
        for r in asof_join(ldf, rdf, "ts", ["k"], tolerance=tol).collect()
    }
    by_key: dict[str, list[int]] = {}
    for k, ts, _, _ in right:
        by_key.setdefault(k, []).append(ts)
    for k, ts, lid in left:
        cands = [t for t in by_key.get(k, []) if t <= ts]
        best = max(cands) if cands else None
        want = best if best is not None and ts - best <= tol else None
        assert got[lid] == want, (k, ts)
    # a right row AT the left timestamp matches (ties included)
    l1 = spark.createDataFrame([("a", 100, 1)], "k string, ts long, lid long")
    r1 = spark.createDataFrame([("a", 100, "x", 5)], "k string, ts long, tag string, px long")
    assert asof_join(l1, r1, "ts", ["k"]).first()["tag_right"] == "x"


def test_asof_null_ts_never_matches(spark):
    l1 = spark.createDataFrame(
        [("a", None, 1), ("a", 10, 2)], "k string, ts long, lid long"
    )
    r1 = spark.createDataFrame([("a", 5, "x", 1)], "k string, ts long, tag string, px long")
    for direction in ("backward", "forward"):
        got = {r["lid"]: r["tag_right"]
               for r in asof_join(l1, r1, "ts", ["k"], direction=direction).collect()}
        assert got[1] is None, direction
    with pytest.raises(ValueError, match="direction"):
        asof_join(l1, r1, "ts", ["k"], direction="nearest")


def test_asof_plan_single_exchange_no_python(spark, frames):
    import contextlib
    import io

    ldf, rdf, _, _ = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(ldf, rdf, "ts", ["k"]).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------- range join


def _range_data():
    rng = random.Random(7)
    points = [("a" if i % 2 else "b", rng.randrange(0, 500), i) for i in range(120)]
    intervals = []
    for j in range(40):
        k = "a" if j % 2 else "b"
        s = rng.randrange(0, 480)
        intervals.append((k, s, s + rng.randrange(0, 60), f"iv{j}"))
    return points, intervals


def _duck_range(points, intervals, how: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE p (k VARCHAR, ts BIGINT, pid BIGINT)")
    con.execute("CREATE TABLE i (k VARCHAR, s BIGINT, e BIGINT, iv VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", points)
    con.executemany("INSERT INTO i VALUES (?, ?, ?, ?)", intervals)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return sorted(
        con.execute(
            f"SELECT p.pid, i.iv FROM p {join} i"
            " ON p.k = i.k AND p.ts BETWEEN i.s AND i.e"
        ).fetchall()
    )


@pytest.mark.parametrize("bucket_width", [1, 16, 64, 1000])
def test_point_in_interval_join_matches_duckdb(spark, bucket_width):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.asof import (
        point_in_interval_join,
    )

    points, intervals = _range_data()
    p = spark.createDataFrame(points, "k string, ts long, pid long")
    i = spark.createDataFrame(intervals, "k string, s long, e long, iv string")
    got = sorted(
        (r["pid"], r["iv"])
        for r in point_in_interval_join(
            p, i, "ts", "s", "e", by_cols=["k"], bucket_width=bucket_width
        ).collect()
    )
    assert got == _duck_range(points, intervals, "inner")


def test_point_in_interval_left_join_pads_unmatched(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.asof import (
        point_in_interval_join,
    )

    points, intervals = _range_data()
    p = spark.createDataFrame(points, "k string, ts long, pid long")
    i = spark.createDataFrame(intervals, "k string, s long, e long, iv string")
    got = sorted(
        (r["pid"], r["iv"])
        for r in point_in_interval_join(
            p, i, "ts", "s", "e", by_cols=["k"], bucket_width=32, how="left"
        ).collect()
    )
    assert got == _duck_range(points, intervals, "left")
    with pytest.raises(ValueError, match="bucket_width"):
        point_in_interval_join(p, i, "ts", "s", "e", bucket_width=0)


def test_asof_randomized_large_matches_duckdb(spark):
    """Adversarial randomized case: many keys, clustered + duplicate
    left timestamps, sparse/hot keys, and left-only keys — one large
    draw (fixed seed) compared row-for-row against DuckDB's ASOF JOIN
    in both directions."""
    rng = random.Random(7)
    keys = [f"k{i}" for i in range(40)]
    left = []
    for i in range(2000):
        k = rng.choice(keys)
        # clustered timestamps with duplicates (ties across left rows)
        ts = rng.randrange(0, 500) * 4
        left.append((k, ts, i))
    left.append(("only-left", 123, 99999))
    right = []
    used = set()
    for _ in range(600):
        k = rng.choice(keys[:30])  # last 10 keys are right-empty
        ts = rng.randrange(0, 2000)
        if (k, ts) in used:
            continue
        used.add((k, ts))
        right.append((k, ts, f"{k}@{ts}", ts * 3))
    ldf = spark.createDataFrame(left, "k string, ts long, lid long")
    rdf = spark.createDataFrame(right, "k string, ts long, tag string, px long")
    for direction, cmp in (("backward", ">="), ("forward", "<=")):
        got = {
            r["lid"]: (r["ts_right"], r["tag_right"], r["px_right"])
            for r in asof_join(
                ldf, rdf, ts_col="ts", by_cols=["k"], direction=direction
            ).collect()
        }
        want = _duck(left, right, cmp)
        assert got == want, direction
