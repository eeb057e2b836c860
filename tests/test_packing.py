"""Sequence packing (operators/packing.py): greedy contiguous fill vs
a DuckDB window oracle; first-fit-decreasing invariants + determinism."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import (
    pack_ffd,
    pack_greedy,
    pack_stats,
)

BUDGET = 100


def _rows():
    # deterministic pseudo-random token counts across 3 groups,
    # including one oversized document (> budget)
    rows = [
        (f"g{i % 3}", f"d{i:03d}", 1 + (i * 37) % 70) for i in range(90)
    ]
    rows.append(("g0", "d900", 250))  # oversized
    return rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_rows(), "grp string, doc_id string, toks int")


def test_pack_greedy_matches_duckdb_oracle(spark, docs):
    got = sorted(
        (r["grp"], r["doc_id"], r["bin_id"])
        for r in pack_greedy(docs, ["grp"], ["doc_id"], "toks", BUDGET).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, doc_id VARCHAR, toks INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", _rows())
    want = sorted(
        con.execute(
            f"""
            SELECT grp, doc_id,
                   CAST(FLOOR(COALESCE(SUM(toks) OVER (
                       PARTITION BY grp ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {BUDGET}) AS BIGINT) AS bin_id
            FROM t
            """
        ).fetchall()
    )
    assert got == want


def test_pack_greedy_bin_properties(spark, docs):
    packed = pack_greedy(docs, ["grp"], ["doc_id"], "toks", BUDGET).collect()
    by_group: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r["grp"], r["doc_id"])):
        by_group.setdefault(r["grp"], []).append(r)
    for rows in by_group.values():
        bins = [r["bin_id"] for r in rows]
        # contiguous fill: bin ids are non-decreasing in document order
        assert bins == sorted(bins)
        # each bin STARTS under budget: the pre-overflow load is < budget,
        # so a bin exceeds it by at most its final (boundary) document
        fill: dict[int, int] = {}
        for r in rows:
            prev = fill.get(r["bin_id"], 0)
            assert prev < BUDGET
            fill[r["bin_id"]] = prev + r["toks"]


def test_pack_ffd_invariants(spark, docs):
    packed = pack_ffd(docs, ["grp"], "doc_id", "toks", BUDGET).collect()
    # every document assigned exactly once, tokens preserved
    assert sorted((r["grp"], r["doc_id"]) for r in packed) == sorted(
        (g, d) for g, d, _ in _rows()
    )
    toks = {(g, d): t for g, d, t in _rows()}
    fill: dict[tuple[str, int], int] = {}
    for r in packed:
        assert r["tokens"] == toks[(r["grp"], r["doc_id"])]
        fill[(r["grp"], r["bin_id"])] = fill.get((r["grp"], r["bin_id"]), 0) + r["tokens"]
    # hard cap: only a single oversized doc may exceed the budget
    for (g, b), total in fill.items():
        members = [
            r for r in packed if (r["grp"], r["bin_id"]) == (g, b)
        ]
        if total > BUDGET:
            assert len(members) == 1 and members[0]["tokens"] > BUDGET
    # the oversized doc sits alone
    big = next(r for r in packed if r["doc_id"] == "d900")
    assert fill[("g0", big["bin_id"])] == 250


def test_pack_ffd_deterministic_and_no_looser_than_greedy(spark, docs):
    a = {
        (r["grp"], r["doc_id"]): r["bin_id"]
        for r in pack_ffd(docs, ["grp"], "doc_id", "toks", BUDGET).collect()
    }
    b = {
        (r["grp"], r["doc_id"]): r["bin_id"]
        for r in pack_ffd(
            docs.repartition(7, "doc_id"), ["grp"], "doc_id", "toks", BUDGET
        ).collect()
    }
    assert a == b  # partitioning-independent assignment
    # first-fit quality bound: at most ONE bin per group may end ≤ half
    # full (two half-empty bins would have been merged by first-fit) —
    # oversized single-doc bins excepted
    fill: dict[tuple[str, int], int] = {}
    for r in pack_ffd(docs, ["grp"], "doc_id", "toks", BUDGET).collect():
        fill[(r["grp"], r["bin_id"])] = (
            fill.get((r["grp"], r["bin_id"]), 0) + r["tokens"]
        )
    half_empty: dict[str, int] = {}
    for (g, _), total in fill.items():
        if total <= BUDGET // 2:
            half_empty[g] = half_empty.get(g, 0) + 1
    assert all(n <= 1 for n in half_empty.values()), half_empty


def test_pack_stats(spark, docs):
    packed = pack_greedy(docs, ["grp"], ["doc_id"], "toks", BUDGET)
    stats = pack_stats(packed, ["grp"], "toks", BUDGET).collect()
    assert sum(r["docs"] for r in stats) == len(_rows())
    for r in stats:
        assert r["fill_rate"] == pytest.approx(r["tokens"] / BUDGET)
    with pytest.raises(ValueError, match="budget"):
        pack_greedy(packed, ["grp"], ["doc_id"], "toks", 0)


def test_packing_plan_shapes(spark, docs):
    """pack_greedy: one exchange (the group-key shuffle feeding the
    window) and zero Python nodes; pack_stats on top re-uses the same
    partitioning lineage — the aggregate adds its own exchange but the
    pack itself stays single-shuffle."""
    import contextlib
    import io

    import re

    def plan(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def exchanges(p: str) -> int:
        # count detail headers like "(4) Exchange": one per node (the
        # tree section prints the same node as "Exchange (4)")
        return len(re.findall(r"^\(\d+\) Exchange", p, flags=re.M))

    packed = pack_greedy(docs, ["grp"], ["doc_id"], "toks", BUDGET)
    p = plan(packed)
    assert exchanges(p) == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # FFD is the documented pandas exception: exactly one group-key
    # exchange feeding the FlatMapGroupsInPandas node
    f = plan(pack_ffd(docs, ["grp"], "doc_id", "toks", BUDGET))
    assert exchanges(f) == 1, f
    assert "FlatMapGroupsInPandas" in f


# ------------------------------------------------------------- property


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

token_lists = st.lists(
    st.tuples(st.integers(0, 2), st.integers(1, 3 * BUDGET)), min_size=1, max_size=40
)


@given(token_lists)
@SLOW
def test_pack_greedy_matches_python_fold_property(spark, items):
    rows = [(f"g{g}", f"d{i:03d}", t) for i, (g, t) in enumerate(items)]
    df = spark.createDataFrame(rows, "grp string, doc_id string, toks int")
    got = {
        (r["grp"], r["doc_id"]): r["bin_id"]
        for r in pack_greedy(df, ["grp"], ["doc_id"], "toks", BUDGET).collect()
    }
    want: dict[tuple[str, str], int] = {}
    by_group: dict[str, list] = {}
    for g, d, t in sorted(rows):
        by_group.setdefault(g, []).append((d, t))
    for g, docs_ in by_group.items():
        acc = 0
        for d, t in docs_:
            want[(g, d)] = acc // BUDGET
            acc += t
    assert got == want


@given(token_lists)
@SLOW
def test_pack_ffd_invariants_property(spark, items):
    rows = [(f"g{g}", f"d{i:03d}", t) for i, (g, t) in enumerate(items)]
    df = spark.createDataFrame(rows, "grp string, doc_id string, toks int")
    packed = pack_ffd(df, ["grp"], "doc_id", "toks", BUDGET).collect()
    assert sorted((r["grp"], r["doc_id"]) for r in packed) == sorted(
        (g, d) for g, d, _ in rows
    )
    fill: dict[tuple[str, int], list[int]] = {}
    for r in packed:
        fill.setdefault((r["grp"], r["bin_id"]), []).append(r["tokens"])
    for members in fill.values():
        # budget respected unless a lone oversized document
        assert sum(members) <= BUDGET or (len(members) == 1 and members[0] > BUDGET)


def test_assemble_bins_sequences_and_boundaries(spark):
    """assemble_bins materializes pack_greedy's assignment into
    loader-ready sequences: ids concatenate in pack order, doc_lens
    partitions input_ids exactly, and the result is independent of the
    input's row order (the in-row sort, not collect_list order, decides)."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import (
        assemble_bins,
        pack_greedy,
    )

    rows = [
        # (doc_id, chunk_idx, ids)
        (1, 0, [1, 2, 3]),
        (1, 1, [4, 5]),
        (2, 0, [6]),
        (3, 0, [7, 8, 9, 10]),
        (4, 0, [11, 12]),
    ]
    df = spark.createDataFrame(
        [(d, c, ids, len(ids), "g") for d, c, ids in rows],
        "doc_id long, chunk_idx int, chunk_ids array<int>, n_tokens long, grp string",
    )
    packed = pack_greedy(
        df, ["grp"], [F.asc("doc_id"), F.asc("chunk_idx")], "n_tokens", budget=6
    )
    out = {
        (r["grp"], r["bin_id"]): r
        for r in assemble_bins(
            packed, ["grp"], ["doc_id", "chunk_idx"]
        ).collect()
    }
    # greedy fill at budget 6: [3,2,1] → bin0, [4,2] → bin1
    b0, b1 = out[("g", 0)], out[("g", 1)]
    assert b0["input_ids"] == [1, 2, 3, 4, 5, 6]
    assert b0["doc_lens"] == [3, 2, 1] and b0["n_docs"] == 3
    assert b1["input_ids"] == [7, 8, 9, 10, 11, 12]
    assert b1["doc_lens"] == [4, 2]
    for r in out.values():
        assert sum(r["doc_lens"]) == r["n_tokens"] == len(r["input_ids"])

    # row-order independence
    shuffled = assemble_bins(
        packed.orderBy(F.desc("doc_id")),
        ["grp"],
        ["doc_id", "chunk_idx"],
    ).collect()
    assert {
        (r["grp"], r["bin_id"]): r["input_ids"] for r in shuffled
    } == {k: v["input_ids"] for k, v in out.items()}


def test_assemble_bins_plan_single_shuffle_no_python(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import (
        assemble_bins,
    )

    df = spark.createDataFrame(
        [(1, 0, [1], 1, "g", 0)],
        "doc_id long, chunk_idx int, chunk_ids array<int>, n_tokens long, grp string, bin_id long",
    )
    plan = (
        assemble_bins(df, ["grp"], ["doc_id", "chunk_idx"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.replace("BroadcastExchange", "").count("Exchange") <= 2  # partial+final agg pair
    assert "BatchEvalPython" not in plan
    import pytest as _p

    with _p.raises(ValueError):
        assemble_bins(df, [], ["doc_id"])
    with _p.raises(ValueError):
        assemble_bins(df, ["grp"], [F.asc("doc_id")])


def test_assemble_bins_accepts_columns_named_like_sort_tokens(spark):
    """Review regression: a column NAMED 'ASCII_rank' is a plain
    column, not a SortOrder — it must be accepted."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import (
        assemble_bins,
    )

    df = spark.createDataFrame(
        [(0, [1, 2], "g", 0), (1, [3], "g", 0)],
        "ASCII_rank long, chunk_ids array<int>, grp string, bin_id long",
    )
    out = assemble_bins(df, ["grp"], ["ASCII_rank"]).collect()
    assert out[0]["input_ids"] == [1, 2, 3]
