"""Salted aggregation/join correctness: identical results to the plain
forms on skewed data (one key holding ~90% of rows)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # hot rows are distinct (realistic: many events share a key) — the
    # content-derived salt needs row entropy to spread; fully duplicate
    # rows co-locate by design (deterministic salt)
    hot = spark.range(0, 9_000).select(
        F.lit("HOT").alias("k"), F.col("id").cast("double").alias("v")
    )
    cold = spark.range(0, 1_000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 3).cast("double").alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in skew.salted_aggregate(
            skewed,
            keys=["k"],
            aggs={
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            buckets=8,
        ).collect()
    }
    assert salted == plain
    assert plain["HOT"][1] == 9_000
    assert plain["HOT"][3] == 8_999.0


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", 1.5)] + [(f"c{i}", float(i)) for i in range(50)],
        "k string, weight double",
    )
    plain = sorted(
        (r["k"], r["v"], r["weight"])
        for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["weight"])
        for r in skew.salted_join(skewed, dim, on="k", buckets=8).collect()
    )
    assert salted == plain
    assert len(plain) == 10_000


def test_salt_is_deterministic(spark, skewed):
    a = skew.with_salt(skewed, 16).groupBy("_salt").count().collect()
    b = skew.with_salt(skewed, 16).groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the hot key actually spreads across salts
    hot_salts = (
        skew.with_salt(skewed.filter(F.col("k") == "HOT"), 16)
        .select("_salt")
        .distinct()
        .count()
    )
    assert hot_salts == 16
