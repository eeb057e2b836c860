"""Sketch accuracy: HLL++ approx_count_distinct within its rsd bound."""

from __future__ import annotations

from topn_clashroyal_etl_sql_snapshot_spark.plans import testdata_queries


def test_approx_distinct_within_bound(spark):
    row = testdata_queries.queries()["approx_distinct_sketch"](
        spark, "/root/testdata/sf0.01"
    ).first()
    for exact, approx in (
        (row["exact_parts"], row["approx_parts"]),
        (row["exact_orders"], row["approx_orders"]),
    ):
        assert abs(approx - exact) / exact < 0.1, (exact, approx)
