"""JDBC sink round-trip against embedded Derby (ships with Spark).

Exercises ``write_snapshot_jdbc`` — the mirror of the reference's
Postgres load (scripts/etl_snapshot_topn.py:363-527) — end-to-end:
write, read back, overwrite again (TRUNCATE+RELOAD semantics), read
back again.
"""

from __future__ import annotations

from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as sink

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .options(url=url, dbtable=table, driver=DRIVER)
        .load()
    )


def test_jdbc_roundtrip_and_overwrite(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/snapdb;create=true"
    props = {"driver": DRIVER}

    v1 = spark.createDataFrame(
        [("Siege", 10, 4), ("Bait", 7, 5)],
        "deck_type string, uses long, wins long",
    )
    sink.write_snapshot_jdbc({"meta_deck_types": v1}, url, properties=props)
    back = _read(spark, url, "meta_deck_types")
    assert sorted(tuple(r) for r in back.collect()) == [
        ("Bait", 7, 5),
        ("Siege", 10, 4),
    ]

    # overwrite ≡ TRUNCATE + RELOAD: second snapshot fully replaces the
    # first (no residue rows, new values visible)
    v2 = spark.createDataFrame(
        [("Cycle", 3, 1)], "deck_type string, uses long, wins long"
    )
    sink.write_snapshot_jdbc({"meta_deck_types": v2}, url, properties=props)
    back2 = _read(spark, url, "meta_deck_types")
    assert [tuple(r) for r in back2.collect()] == [("Cycle", 3, 1)]


def test_publish_snapshot_to_second_database(spark, tmp_path):
    """A7 cloud publish: local DB → second DB (Derby → Derby stands in
    for local Postgres → cloud Postgres). Every table arrives intact,
    re-publish overwrites (the dump's DROP+CREATE+COPY semantics), and
    the returned row accounting matches."""
    local = f"jdbc:derby:{tmp_path}/localdb;create=true"
    cloud = f"jdbc:derby:{tmp_path}/clouddb;create=true"
    props = {"driver": DRIVER}

    t1 = spark.createDataFrame(
        [("Siege", 10, 4), ("Bait", 7, 5)],
        "deck_type string, uses long, wins long",
    )
    t2 = spark.createDataFrame(
        [("p1", 3), ("p2", 9)], "player_tag string, battles long"
    )
    sink.write_snapshot_jdbc(
        {"meta_deck_types": t1, "player_summary": t2}, local, properties=props
    )

    counts = sink.publish_snapshot_jdbc(
        spark,
        local,
        cloud,
        ["meta_deck_types", "player_summary"],
        source_properties=props,
        target_properties=props,
    )
    assert counts == {"meta_deck_types": 2, "player_summary": 2}
    got = _read(spark, cloud, "meta_deck_types")
    assert sorted(tuple(r) for r in got.collect()) == [
        ("Bait", 7, 5),
        ("Siege", 10, 4),
    ]

    # re-publish after the local snapshot changed: target fully replaced
    sink.write_snapshot_jdbc(
        {"meta_deck_types": spark.createDataFrame(
            [("Cycle", 3, 1)], "deck_type string, uses long, wins long"
        )},
        local,
        properties=props,
    )
    sink.publish_snapshot_jdbc(
        spark, local, cloud, ["meta_deck_types"],
        source_properties=props, target_properties=props,
    )
    assert [tuple(r) for r in _read(spark, cloud, "meta_deck_types").collect()] == [
        ("Cycle", 3, 1)
    ]


def test_publish_warehouse_to_database(spark, tmp_path):
    """Parquet warehouse → serving DB publish (the lake-resident
    snapshot shape)."""
    wh = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [("Siege", 10, 4)], "deck_type string, uses long, wins long"
    )
    sink.write_snapshot({"meta_deck_types": df}, wh)
    cloud = f"jdbc:derby:{tmp_path}/clouddb2;create=true"
    counts = sink.publish_warehouse_jdbc(
        spark, wh, cloud, ["meta_deck_types"],
        target_properties={"driver": DRIVER},
    )
    assert counts == {"meta_deck_types": 1}
    assert [tuple(r) for r in _read(spark, cloud, "meta_deck_types").collect()] == [
        ("Siege", 10, 4)
    ]


def test_publish_with_partitioned_source_read(spark, tmp_path):
    """The documented parallel-read path: Spark JDBC partitioning
    options passed through source_properties produce a multi-partition
    source read and an identical published result."""
    local = f"jdbc:derby:{tmp_path}/plocal;create=true"
    cloud = f"jdbc:derby:{tmp_path}/pcloud;create=true"
    props = {"driver": DRIVER}

    rows = [(i, f"p{i % 7}", i * 10) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, tag string, v long")
    sink.write_snapshot_jdbc({"wide_table": df}, local, properties=props)

    # partitioned read reaches the executors in 4 slices
    part_props = {
        **props,
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "50",
        "numPartitions": "4",
    }
    src = (
        spark.read.format("jdbc")
        .options(url=local, dbtable="wide_table", **part_props)
        .load()
    )
    assert src.rdd.getNumPartitions() == 4

    counts = sink.publish_snapshot_jdbc(
        spark, local, cloud, ["wide_table"],
        source_properties=part_props, target_properties=props,
    )
    assert counts == {"wide_table": 50}
    got = sorted(tuple(r) for r in _read(spark, cloud, "wide_table").collect())
    assert got == sorted(rows)
