"""Bucketing: pre-partitioned co-located joins — the 100 TB strategy for
repeated large-fact joins (SCALE.md). Writing both sides bucketed on the
join key lets the join run with ZERO exchanges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse dir is static conf, set in conftest's session build
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 500).alias("o_custkey"),
        (F.rand(42) * 1000).alias("o_totalprice"),
    )
    lineitem = spark.range(0, 40_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"),
        (F.col("id") % 200).alias("l_partkey"),
        (F.rand(7) * 50).alias("l_quantity"),
    )
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("lineitem_b")
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    with _no_broadcast(spark):  # force a non-broadcast join strategy
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join itself requires no hash exchange on
    # either side — only the final (tiny) groupBy shuffles
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert joined.count() == 500


def test_unbucketed_same_join_shuffles(bucketed):
    spark = bucketed
    # control: identical data read as plain parquet shuffles both sides
    o = spark.table("orders_b").localCheckpoint()
    li = spark.table("lineitem_b").localCheckpoint()
    with _no_broadcast(spark):
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *a):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.old)
