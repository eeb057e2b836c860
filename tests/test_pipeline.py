"""End-to-end pipeline test: Spark snapshot ETL vs the pure-Python oracle,
table-for-table, plus the G1-G6 invariant suite."""

from __future__ import annotations

import pytest

from topn_clashroyal_etl_sql_snapshot_spark.plans import pipeline, validate
from topn_clashroyal_etl_sql_snapshot_spark.sources.schemas import (
    BATTLE_SCHEMA,
    CARD_METADATA_SCHEMA,
    LEADERBOARD_SCHEMA,
    OVERRIDES_SCHEMA,
)

from topn_clashroyal_etl_sql_snapshot_spark.testing.cr_synthetic import CATALOG_ROWS, generate_fixture, oracle_etl

TOP_N = 5


@pytest.fixture(scope="module")
def snapshot(spark):
    leaderboard, battles, overrides = generate_fixture()
    result = pipeline.build_snapshot(
        spark,
        battles=spark.createDataFrame(battles, BATTLE_SCHEMA),
        leaderboard=spark.createDataFrame(leaderboard, LEADERBOARD_SCHEMA),
        catalog=spark.createDataFrame(CATALOG_ROWS, CARD_METADATA_SCHEMA),
        overrides=spark.createDataFrame(overrides, OVERRIDES_SCHEMA),
        top_n=TOP_N,
    )
    oracle = oracle_etl(leaderboard, battles, overrides, TOP_N)
    yield result, oracle
    result.unpersist()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_counters(snapshot):
    result, oracle = snapshot
    assert result.counters["deduped_matches"] == oracle["deduped_matches"]
    assert result.counters["scanned_entries"] > oracle["deduped_matches"]


def test_player_dim(snapshot):
    result, oracle = snapshot
    got = _rows(result.tables["player"], ["player_tag", "player_name", "trophies", "rank_global"])
    want = sorted(
        (p["player_tag"], p["player_name"], p["trophies"], p["rank_global"])
        for p in oracle["player"]
    )
    assert got == want


def test_deck_types_dim(snapshot):
    result, oracle = snapshot
    got = sorted(r[0] for r in result.tables["deck_types"].collect())
    assert got == oracle["deck_types"]


def test_cards_dim(snapshot):
    result, oracle = snapshot
    got = _rows(result.tables["cards"], ["card_id", "card_name"])
    assert got == sorted(oracle["cards"].items())


def test_decks_dim(snapshot):
    result, oracle = snapshot
    got = _rows(result.tables["decks"], ["deck_hash", "deck_type"])
    assert got == sorted(oracle["decks"].items())


def test_deck_cards(snapshot):
    result, oracle = snapshot
    got = _rows(result.tables["deck_cards"], ["deck_hash", "card_id", "card_variant", "slot"])
    want = sorted(
        (dh, cid, var, slot)
        for dh, obs in oracle["deck_cards"].items()
        for (cid, _, var, slot) in obs
    )
    assert got == want


def test_overrides_beat_classifier(snapshot):
    result, oracle = snapshot
    types = dict(_rows(result.tables["decks"], ["deck_hash", "deck_type"]))
    assert "OverriddenSiege" in types.values()


@pytest.mark.parametrize(
    "table,keys",
    [
        ("player_decks", ("player_tag", "deck_hash")),
        ("meta_deck_types", ("deck_type",)),
        ("meta_type_deck_ids", ("deck_type", "deck_hash")),
        ("meta_type_cards", ("deck_type", "card_id", "card_variant")),
        ("player_type_cards", ("player_tag", "deck_type", "card_id", "card_variant")),
        ("meta_type_matchups", ("deck_type", "opp_deck_type")),
    ],
)
def test_rollups_match_oracle(snapshot, table, keys):
    result, oracle = snapshot
    cols = list(keys) + ["uses", "wins"]
    got = _rows(result.tables[table], cols)
    want = sorted(
        (k if isinstance(k, tuple) else (k,)) + (u, w)
        for k, (u, w) in oracle[table].items()
    )
    assert got == want, f"{table}: {len(got)} vs {len(want)} rows"


def test_top_players_edge_semantics(spark):
    """Reference edge behavior (scripts:203-216): the positional top_n
    cut applies to RAW rows before tag validation (a bad row inside the
    cut shrinks the dim, not pulls a replacement), and rank 0 is falsy
    (→ positional fallback, like Python's ``rank or i``)."""
    rows = [
        ("#A", "a", 0, None, 10),   # rank 0 → rank_global = position 1
        ("", "b", 2, None, 9),      # empty tag INSIDE the cut → dropped
        ("#C", "c", 3, None, 8),
        ("#D", "d", 4, None, 7),    # outside top_n=3 → cut
    ]
    df = spark.createDataFrame(rows, LEADERBOARD_SCHEMA)
    got = pipeline.top_players_df(df, top_n=3).orderBy("rank_global").collect()
    assert [(r.player_tag, r.rank_global) for r in got] == [("#A", 1), ("#C", 3)]


def test_top_players_rejects_table_scale_input(spark):
    """The single-partition ranking window is sized for one API page;
    anything larger must be refused, not silently serialized."""
    import pytest

    big = spark.range(20).selectExpr(
        "concat('#P', id) AS tag",
        "'n' AS name",
        "CAST(id AS INT) AS rank",
        "CAST(NULL AS INT) AS eloRating",
        "CAST(1000 - id AS INT) AS trophies",
    )
    with pytest.raises(ValueError, match="single-partition window"):
        pipeline.top_players_df(big, top_n=5, max_rows=10)


def test_player_battles_fact(snapshot):
    """Boolean-grain fact matches the oracle row-for-row, and
    player_decks is exactly its groupBy(count, sum(win)) rollup."""
    from pyspark.sql import functions as F

    result, oracle = snapshot
    cols = ["match_hash", "battle_time", "side", "player_tag", "deck_hash", "win"]
    got = _rows(result.tables["player_battles"], cols)
    want = sorted(tuple(r[c] for c in cols) for r in oracle["player_battles"])
    assert got == want

    rolled = (
        result.tables["player_battles"]
        .groupBy("player_tag", "deck_hash")
        .agg(
            F.count(F.lit(1)).alias("uses"),
            F.sum(F.col("win").cast("long")).alias("wins"),
        )
    )
    assert _rows(rolled, ["player_tag", "deck_hash", "uses", "wins"]) == _rows(
        result.tables["player_decks"], ["player_tag", "deck_hash", "uses", "wins"]
    )


def test_matchup_double_insert_invariant(snapshot):
    # SUM(matchups.uses) == 2 × battles surviving extraction (FIXTURES.md §2)
    result, oracle = snapshot
    total = sum(u for (u, _) in oracle["meta_type_matchups"].values())
    got = result.tables["meta_type_matchups"].groupBy().sum("uses").first()[0]
    assert got == total
    assert got % 2 == 0


def test_validation_suite_green(snapshot):
    result, _ = snapshot
    checks = validate.run_all(result.tables, expected_top_n=TOP_N)
    failures = [c for c in checks if not c.passed]
    assert not failures, failures


def test_catalog_smoke(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.plans.validate import check_catalog_smoke

    c = check_catalog_smoke(spark)
    assert c.passed, c
