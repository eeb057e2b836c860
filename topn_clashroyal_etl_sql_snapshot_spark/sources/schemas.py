"""Explicit StructType schemas for every input and warehouse table.

The reference declares its warehouse schema in Postgres DDL
(``/root/reference/db/schema.sql``) and reads API JSON schema-on-read with
defensive Python coercion (``scripts/etl_snapshot_topn.py:77-108``). Here
every layer gets a declared schema — never inference for the warehouse —
so parquet scans prune columns and the JSON reader rejects shape drift
deterministically.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw API-shaped inputs (landing zone JSON)
# ---------------------------------------------------------------------------

# One battlelog card: /root/reference/test_grab_player.py:70-79,
# scripts/etl_snapshot_topn.py:50-66 (evolutionLevel 0/absent, 1=evo, 2=hero)
CARD_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("evolutionLevel", T.IntegerType(), True),
    ]
)

# One battle participant: tag + crowns + 8-card deck
PARTICIPANT_STRUCT = T.StructType(
    [
        T.StructField("tag", T.StringType(), True),
        T.StructField("crowns", T.IntegerType(), True),
        T.StructField("cards", T.ArrayType(CARD_STRUCT), True),
    ]
)

# Raw battlelog entry: /root/reference/src/analysist/battle_filters.py:52-97
BATTLE_SCHEMA = T.StructType(
    [
        T.StructField("battleTime", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField(
            "gameMode",
            T.StructType(
                [
                    T.StructField("id", T.LongType(), True),
                    T.StructField("name", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("team", T.ArrayType(PARTICIPANT_STRUCT), True),
        T.StructField("opponent", T.ArrayType(PARTICIPANT_STRUCT), True),
    ]
)

# Leaderboard player: /root/reference/src/api/players.py:6-23,
# scripts/etl_snapshot_topn.py:203-216 (trophies OR eloRating, maybe neither)
LEADERBOARD_SCHEMA = T.StructType(
    [
        T.StructField("tag", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("rank", T.IntegerType(), True),
        T.StructField("trophies", T.LongType(), True),
        T.StructField("eloRating", T.LongType(), True),
    ]
)

# Static card catalog: /root/reference/src/data/card_metadata.json (121 rows)
CARD_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("maxLevel", T.IntegerType(), True),
        T.StructField("elixir", T.IntegerType(), True),
        T.StructField("is_big_tank", T.BooleanType(), True),
        T.StructField("is_bait_piece", T.BooleanType(), True),
        T.StructField("is_bridge_spam_piece", T.BooleanType(), True),
    ]
)

# Manual config surviving refresh: /root/reference/db/schema.sql:37-40
OVERRIDES_SCHEMA = T.StructType(
    [
        T.StructField("deck_hash", T.StringType(), False),
        T.StructField("deck_type", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Warehouse layer (star schema) — /root/reference/db/schema.sql
# ---------------------------------------------------------------------------

WAREHOUSE_SCHEMAS: dict[str, T.StructType] = {
    # db/schema.sql:11-13
    "deck_types": T.StructType([T.StructField("deck_type", T.StringType(), False)]),
    # db/schema.sql:16-21
    "player": T.StructType(
        [
            T.StructField("player_tag", T.StringType(), False),
            T.StructField("player_name", T.StringType(), True),
            T.StructField("trophies", T.LongType(), True),
            T.StructField("rank_global", T.IntegerType(), True),
        ]
    ),
    # db/schema.sql:24-27
    "cards": T.StructType(
        [
            T.StructField("card_id", T.LongType(), False),
            T.StructField("card_name", T.StringType(), True),
        ]
    ),
    # db/schema.sql:31-34
    "decks": T.StructType(
        [
            T.StructField("deck_hash", T.StringType(), False),
            T.StructField("deck_type", T.StringType(), False),
        ]
    ),
    # db/schema.sql:47-60 — exactly 8 rows per deck_hash
    "deck_cards": T.StructType(
        [
            T.StructField("deck_hash", T.StringType(), False),
            T.StructField("card_id", T.LongType(), False),
            T.StructField("card_variant", T.StringType(), False),
            T.StructField("slot", T.IntegerType(), True),
        ]
    ),
    # db/schema.sql:63-73 — counters use LongType: at 100 TB these overflow int32
    "player_decks": T.StructType(
        [
            T.StructField("player_tag", T.StringType(), False),
            T.StructField("deck_hash", T.StringType(), False),
            T.StructField("uses", T.LongType(), False),
            T.StructField("wins", T.LongType(), False),
        ]
    ),
    # db/schema.sql:80-87
    "meta_deck_types": T.StructType(
        [
            T.StructField("deck_type", T.StringType(), False),
            T.StructField("uses", T.LongType(), False),
            T.StructField("wins", T.LongType(), False),
        ]
    ),
    # db/schema.sql:90-100
    "meta_type_deck_ids": T.StructType(
        [
            T.StructField("deck_type", T.StringType(), False),
            T.StructField("deck_hash", T.StringType(), False),
            T.StructField("uses", T.LongType(), False),
            T.StructField("wins", T.LongType(), False),
        ]
    ),
    # db/schema.sql:103-117
    "meta_type_cards": T.StructType(
        [
            T.StructField("deck_type", T.StringType(), False),
            T.StructField("card_id", T.LongType(), False),
            T.StructField("card_variant", T.StringType(), False),
            T.StructField("uses", T.LongType(), False),
            T.StructField("wins", T.LongType(), False),
        ]
    ),
    # db/schema.sql:120-135
    "player_type_cards": T.StructType(
        [
            T.StructField("player_tag", T.StringType(), False),
            T.StructField("deck_type", T.StringType(), False),
            T.StructField("card_id", T.LongType(), False),
            T.StructField("card_variant", T.StringType(), False),
            T.StructField("uses", T.LongType(), False),
            T.StructField("wins", T.LongType(), False),
        ]
    ),
    # db/schema.sql:138-152 — directional, mirror matches allowed
    "meta_type_matchups": T.StructType(
        [
            T.StructField("deck_type", T.StringType(), False),
            T.StructField("opp_deck_type", T.StringType(), False),
            T.StructField("uses", T.LongType(), False),
            T.StructField("wins", T.LongType(), False),
        ]
    ),
    "deck_type_overrides": OVERRIDES_SCHEMA,
    # engine-added per-battle boolean-grain fact (no reference DDL —
    # it backs the repo's legacy pd.win SQL; plans/pipeline.py:410-422)
    "player_battles": T.StructType(
        [
            T.StructField("match_hash", T.StringType(), False),
            T.StructField("battle_time", T.StringType(), True),
            T.StructField("side", T.IntegerType(), False),
            T.StructField("player_tag", T.StringType(), False),
            T.StructField("deck_hash", T.StringType(), False),
            T.StructField("win", T.BooleanType(), False),
        ]
    ),
}

# Driver-generated TPC-H-ish synthetic tables (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
