"""Driver-facing query surface over the synthetic testdata tables.

Each entry maps one operator shape from the reference inventory
(SURVEY.md §2) onto the TPC-H-ish tables in TESTDATA.md, as a
(Spark DataFrame function, equivalent DuckDB SQL) pair. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive value
hash — so:

- every computed column is aliased identically on both sides;
- every ORDER BY under a LIMIT has a full deterministic tie-break;
- floating aggregates that sum many values go through DECIMAL casts
  (exact, order-independent) and convert to DOUBLE at the end — a
  parallel Spark sum and a sequential DuckDB sum of raw doubles would
  otherwise differ in the last bits.

Scale notes are per-query; the common themes: small dims broadcast,
aggregations are partial+final hash aggregates, filters sit directly on
the parquet scan (predicate pushdown), and only the grouping shuffle
remains.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_testdata

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_SQL: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if sql is not None:
            _SQL[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(_SQL)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


def _dec_sum(col: F.Column, alias: str) -> F.Column:
    """Order-independent monetary sum: DECIMAL-exact, DOUBLE out."""
    return F.sum(col.cast("decimal(18,2)")).cast("double").alias(alias)


def _revenue_sum(price: F.Column, discount: F.Column, alias: str) -> F.Column:
    """sum(price * (1-discount)) with exact decimal arithmetic."""
    rev = price.cast("decimal(18,2)") * (F.lit(1) - discount).cast("decimal(9,4)")
    return F.sum(rev).cast("double").alias(alias)


_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# F1-F7 — the reference's analysis-SQL shapes (SURVEY.md §2.F)
#
# NOT registered for the driver: each shape's driver-checked twin is the
# cr_f1..cr_f7 query in plans/domain_queries.py, which runs the SAME
# query semantics end-to-end through the snapshot pipeline against the
# independent Python-oracle warehouse — a strictly stronger check. These
# generic-table forms stay as plan-shape exemplars (broadcast joins,
# column pruning, partial aggregation — asserted in tests/test_plans.py)
# so the registry fits the driver's 50-row correctness cap.
# ---------------------------------------------------------------------------

def f1_top_parts_overall(spark, sf_dir):
    """F1 top_cards_overall shape (queries/top_cards_overall.sql:1-8):
    join to a small dim → groupBy → count → top-K. `part` is the small
    side → broadcast: no shuffle on lineitem except the final agg."""
    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("appearances"))
        .orderBy(F.desc("appearances"), "p_name")
        .limit(50)
    )


def f2_top_priority_classes(spark, sf_dir):
    """F2 top_deck_types shape (queries/top_deck_types.sql): uses/wins/
    win_rate counter aggregation ranked by volume."""
    orders = _t(spark, sf_dir, "orders")
    wins = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("uses"),
            wins.alias("wins"),
            F.round(100.0 * wins / F.nullif(F.count(F.lit(1)), F.lit(0)), 2).alias(
                "win_rate"
            ),
        )
        .orderBy(F.desc("uses"), "o_orderpriority")
        .limit(30)
    )


def f3_customer_summary(spark, sf_dir):
    """F3 player_summary shape (queries/player_summary.sql): LEFT JOIN +
    COUNT(col) non-null semantics — customers with no orders still appear
    with orders_seen = 0."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.count("o_orderkey").alias("orders_seen"))
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(50)
    )


def f4_top_brand_flags(spark, sf_dir):
    """F4 top_decks shape (queries/top_decks.sql): two-key groupBy with
    rate ranking."""
    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    wins = F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("uses"),
            wins.alias("wins"),
            F.round(100.0 * wins / F.nullif(F.count(F.lit(1)), F.lit(0)), 2).alias(
                "win_rate"
            ),
        )
        .orderBy(F.desc("uses"), "p_brand", "l_returnflag")
        .limit(50)
    )


def f5_event_type_rates(spark, sf_dir):
    """F5 matchup-winrate shape (scripts/etl_snapshot_topn.py:535-536):
    rate projection over an aggregate, ranked by volume."""
    events = _t(spark, sf_dir, "events")
    wins = F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("uses"),
            wins.alias("wins"),
            (wins.cast("double") / F.nullif(F.count(F.lit(1)), F.lit(0))).alias(
                "winrate"
            ),
        )
        .orderBy(F.desc("uses"), "event_type")
        .limit(20)
    )


def f6_best_parts_having(spark, sf_dir):
    """F6 best-decks-by-winrate shape (scripts:537-538): HAVING support
    threshold ≡ post-aggregation filter, ranked by rate."""
    li = _t(spark, sf_dir, "lineitem")
    wins = F.sum(F.when(F.col("l_discount") >= 0.05, 1).otherwise(0))
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("uses"),
            wins.alias("wins"),
            (wins.cast("double") / F.nullif(F.count(F.lit(1)), F.lit(0))).alias(
                "winrate"
            ),
        )
        .filter(F.col("uses") >= 5)
        .orderBy(F.desc("winrate"), F.desc("uses"), "l_partkey")
        .limit(10)
    )


def f7_order_line_counts(spark, sf_dir):
    """F7/G1 integrity shape (scripts:533): grouped HAVING over a count."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") >= 6)
        .orderBy(F.desc("n_items"), "l_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped coverage (joins, multi-way star, window, semi/anti, dates)
# ---------------------------------------------------------------------------

# Rotated out of the driver registry in r14 for
# embedding_neardup_incremental (50-row cap; r13 verdict next #4): the
# lineitem scan-agg shape stays driver-covered by
# cube_returnflag_status, whose grouping-sets plan strictly contains
# Q1's (returnflag, linestatus) base aggregate over the same decimal
# sums, and the filter-pushdown bar stays pinned in
# tests/test_plans.py. THIS query keeps the identical oracle bar in
# tests/test_rotated_rows.py and its bench series.
Q1_PRICING_SUMMARY_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           {_REVENUE_SQL} AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy partial+final hash aggregate; the filter
    pushes to the parquet scan; decimal sums are order-independent.
    Registered r1-r13; rotated r14 (slot ceded to
    embedding_neardup_incremental — see Q1_PRICING_SUMMARY_SQL)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _revenue_sum(F.col("l_extendedprice"), F.col("l_discount"), "sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Rotated out of the driver registry in r8 to free a slot for the
# Gopher-gates row (50-row cap): the TPC-H join family stays
# represented by q1 (scan-agg) and q5 (multi-join), and THIS query
# keeps the identical oracle bar in tests/test_rotated_rows.py.
Q3_SHIPPING_PRIORITY_SQL = f"""
    SELECT l_orderkey,
           {_REVENUE_SQL} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective filters on all three tables (pushed to
    scans), customer side reduced then broadcast, revenue top-K."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue_sum(F.col("l_extendedprice"), F.col("l_discount"), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_order_volume",
    """
    SELECT r_name, n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    GROUP BY r_name, n_name
    ORDER BY total_price DESC, r_name, n_name
    """,
)
def q5_region_order_volume(spark, sf_dir):
    """TPC-H Q5 shape: 4-way star join; region/nation/customer chain
    collapses to one broadcast side against the orders fact."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy(F.desc("total_price"), "r_name", "n_name")
    )


def semi_customers_with_orders(spark, sf_dir):
    """Semi-join (D5 TopN gate shape, scripts:332-335): EXISTS ≡ left_semi.

    Driver-checked via ``setops_suite`` (the four semi/anti/intersect/
    except shapes union into one labeled result so the registry fits the
    driver's 50-row cap without dropping any shape's coverage)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def anti_customers_without_orders(spark, sf_dir):
    """Anti-join (FK-orphan validation shape, validate.py): NOT EXISTS ≡
    left_anti. Driver-checked via ``setops_suite``."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def window_top_orders_per_customer(spark, sf_dir):
    """Window top-K per group — the idiomatic-Spark extension of the
    reference's sort-based rankings (SURVEY.md §2.H).

    NOT registered for the driver as of r8 (50-row cap): the
    rank-per-group shape is already hash-checked end-to-end by the
    cr_* TopN rows (top_players_df's row_number ≤ N feeds
    cr_f3_player_summary / cr_player_decks every round); the slot went
    to docs_bm25_topk. Stays oracled in pytest via
    tests/test_rotated_rows.py with the identical DuckDB SQL."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    )


def events_hourly_rollup(spark, sf_dir):
    """Time-bucketed rollup over the event stream table (batch form of the
    streaming windowed agg in streaming/).

    NOT registered for the driver as of r8 (50-row cap): a plain
    date_trunc groupBy whose bucketing+agg shape is already pinned by
    the windowed/sessionized event rows and the streaming twins; the
    slot went to the r7-crop rows (docs_containment /
    docs_term_quality / docs_corpus_profile). Stays oracled in pytest:
    tests/test_rotated_rows.py runs it against the identical DuckDB
    SQL it used to register with."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


# Rotated out of the driver registry in r8 to free a slot for the DSIR
# row (the 50-row cap): a 5-row projection whose get_json_object surface
# stays pinned by tests/test_events_props_json_oracle against this SAME
# SQL; JSON parsing at depth is exercised by the cr_* fixture ingest.
EVENTS_PROPS_JSON_SQL = """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """


def events_props_json(spark, sf_dir):
    """JSON extraction at query time (the reference handles JSON at ingest
    only — this is the query-time equivalent for semi-structured props)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_returnflag_status(spark, sf_dir):
    """CUBE grouping sets — an idiomatic-Spark extension beyond the
    reference surface (SURVEY.md §2.H lists grouping sets as absent)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("l_quantity"), "sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def except_parts_never_shipped(spark, sf_dir):
    """EXCEPT (set difference) — §2.H extension; ≡ the anti-join FK-orphan
    shape expressed as a set operation. Driver-checked via
    ``setops_suite``."""
    part, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    return (
        part.select("p_partkey")
        .subtract(li.select(F.col("l_partkey").alias("p_partkey")))
        .orderBy("p_partkey")
    )


def intersect_active_customers(spark, sf_dir):
    """INTERSECT — §2.H extension; ≡ the semi-join shape as a set op.
    Driver-checked via ``setops_suite``."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.select("c_custkey")
        .intersect(orders.select(F.col("o_custkey").alias("c_custkey")))
        .orderBy("c_custkey")
    )


# Rotated out of the driver registry in r10 (second wave) to free a
# slot for the docs_semantic_decontam row: all four shapes stay
# driver-covered elsewhere — left_semi by cr_player_decks' broadcast
# TopN gate, left_anti by decontaminate_overlap / docs_split_by_
# component's anti legs, and INTERSECT/EXCEPT plan as the same
# distinct-then-join machinery pinned per-leg in tests/test_plans.py.
# This query keeps its identical SQL bar in tests/test_rotated_rows.py
# and its bench series.
SETOPS_SUITE_SQL = """
    SELECT 'semi_with_orders' AS op, c_custkey AS key FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'anti_without_orders' AS op, c_custkey AS key FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'intersect_active' AS op, c_custkey AS key FROM (
        SELECT c_custkey FROM customer
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders
    )
    UNION ALL
    SELECT 'except_never_shipped' AS op, p_partkey AS key FROM (
        SELECT p_partkey FROM part
        EXCEPT
        SELECT l_partkey AS p_partkey FROM lineitem
    )
    ORDER BY op, key
    """


def setops_suite(spark, sf_dir):
    """All four set-op / existence shapes (left_semi, left_anti,
    INTERSECT, EXCEPT — SURVEY.md §2.D5 + §2.H) as one labeled union
    (driver row r7-r10; rotated out r10 for docs_semantic_decontam —
    SQL bar preserved in tests/test_rotated_rows.py).

    Plan: the four branches are independent; the semi/anti pair shares
    the same (broadcast-able) orders build side, INTERSECT/EXCEPT plan
    as distinct-then-join. The union is a no-shuffle concatenation —
    each leg keeps its own plan, so merging loses no physical coverage
    (tests/test_plans.py still asserts the per-leg shapes)."""
    legs = [
        semi_customers_with_orders(spark, sf_dir).select(
            F.lit("semi_with_orders").alias("op"), F.col("c_custkey").alias("key")
        ),
        anti_customers_without_orders(spark, sf_dir).select(
            F.lit("anti_without_orders").alias("op"), F.col("c_custkey").alias("key")
        ),
        intersect_active_customers(spark, sf_dir).select(
            F.lit("intersect_active").alias("op"), F.col("c_custkey").alias("key")
        ),
        except_parts_never_shipped(spark, sf_dir).select(
            F.lit("except_never_shipped").alias("op"), F.col("p_partkey").alias("key")
        ),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("op", "key")


# Rotated out of the driver registry in r10 to free a slot for the
# dedup_component_keepers row: the windowed-aggregate shape stays
# driver-covered by events_sessionize (same partition-ordered window
# machinery) and the decimal-exact sum convention by every monetary
# row; this query keeps its identical SQL bar in
# tests/test_rotated_rows.py. Still timed in the bench.
EVENTS_ROLLING_SUM_SQL = """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_value
    FROM events
    ORDER BY user_id, event_id
    """


def events_rolling_sum(spark, sf_dir):
    """Rolling window aggregate over the event stream (decimal-exact sum;
    ts ties broken by event_id for cross-engine determinism)."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias(
            "rolling_value"
        ),
    ).orderBy("user_id", "event_id")


# Rotated out of the driver registry in r9 to free a slot for the
# embedding_pq_adc row (r7 verdict item 4): its contract row is two
# exact counts + two booleans — the weakest check in the registry —
# and it keeps this SAME SQL bar in tests/test_rotated_rows.py (plus
# the tighter empirical bound in tests/test_sketches.py). Still timed
# in the bench.
APPROX_DISTINCT_SKETCH_SQL = """
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS parts_within_bound,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS orders_within_bound
    FROM lineitem
    """


def approx_distinct_sketch(spark, sf_dir):
    """Cardinality sketches (HyperLogLog++) next to exact counts — the
    100 TB answer to COUNT(DISTINCT) (SURVEY.md §7 step 7). The raw HLL
    estimate is engine-specific, so the driver-checkable contract is the
    exact count plus a boolean asserting the estimate landed within 5×
    the requested rsd (0.02 → 10%) — generous vs. the ~1-2σ typical
    error, and deterministic because Spark's sketch is hash-based, not
    sampled. tests/test_sketches.py asserts the tighter empirical bound.

    Plan note: TWO single-column aggregates cross-joined (both are
    1-row), NOT one agg with two DISTINCT columns — multi-distinct
    plans through Expand, which duplicates every input row per distinct
    set before the shuffle; the split form keeps each hash aggregate on
    its own narrow column (measured 1.6× faster at sf0.1, and at 100 TB
    the expand's doubled shuffle volume is the difference that matters).
    """
    li = _t(spark, sf_dir, "lineitem")
    parts = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_approx_parts"),
    )
    orders = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_approx_orders"),
    )
    agg = parts.crossJoin(orders)

    def within(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= F.col(exact).cast("double") * F.lit(0.10)
        )

    return agg.select(
        "exact_parts",
        within("_approx_parts", "exact_parts").alias("parts_within_bound"),
        "exact_orders",
        within("_approx_orders", "exact_orders").alias("orders_within_bound"),
    )


@register(
    "events_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS BIGINT) AS duration_ms
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) over the event
    stream — the user-activity shaping step of a training-data
    pipeline. One shuffle on user_id serves both window passes and the
    per-session rollup; millisecond timestamps compare identically in
    Spark (unix_millis) and DuckDB (epoch_ms)."""
    from ..operators.sessionize import session_stats

    events = _t(spark, sf_dir, "events")
    return session_stats(events, gap_ms=1_800_000).orderBy("user_id", "session_id")


@register(
    "events_asof_join",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           epoch_ms(v.ts) AS view_ms,
           v.value AS view_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def events_asof_join(spark, sf_dir):
    """Point-in-time join: each purchase event picks up the user's most
    recent prior (or same-instant) view event — the canonical as-of
    shape (align an event with the latest snapshot at event time).
    Spark side is the union-window composition (operators/asof.py: one
    shuffle on user_id, codegen throughout, no theta-join); the oracle
    is DuckDB's native ASOF LEFT JOIN — an independent engine's
    implementation of the same semantics. Timestamps are compared and
    returned as epoch millis on both sides so no tz/stringification
    skew can enter the hash. (user_id, ts) is duplicate-free in this
    corpus, so the matched row is unique and the comparison exact."""
    from ..operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, views, ts_col="ts", by_cols=["user_id"], value_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts")).alias("purchase_ms"),
        F.unix_millis(F.col("ts_right")).alias("view_ms"),
        F.col("value_right").alias("view_value"),
    ).orderBy("event_id")


def percentile_order_prices(spark, sf_dir):
    """Exact continuous percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont` — both linear interpolation on sorted values).

    NOT registered for the driver as of r8 (50-row cap): the exact
    percentile ≡ quantile_cont parity this row pinned is now carried by
    docs_corpus_profile's chars_p10_p50_p90 column; the slot went to
    the r7-crop rows. Stays oracled in pytest via
    tests/test_rotated_rows.py with the identical DuckDB SQL."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .orderBy("o_orderpriority")
    )
