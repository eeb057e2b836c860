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
