"""Analysis query surface: the reference's user-facing SQL (F1-F7) as
DataFrame functions over the warehouse tables.

The legacy ``queries/top_deck_types.sql`` / ``top_decks.sql`` reference a
boolean ``pd.win`` column — a per-battle grain the reference's current
counter-grain ``player_decks`` (db/schema.sql:63-73) no longer carries;
the ETL's own "quick checks" (scripts/etl_snapshot_topn.py:530-538) show
the counter-grain forms. This engine serves BOTH: the counter-grain
forms below run against ``player_decks``, and the ``*_legacy`` forms run
the repo's SQL as literally written against the ``player_battles``
boolean-grain fact (plans/pipeline.py).

Every aggregate is aliased so the names line up with the DuckDB oracle SQL
in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import win_rate


def top_cards_overall(deck_cards: DataFrame, cards: DataFrame, limit: int = 50) -> DataFrame:
    """F1 (queries/top_cards_overall.sql): card appearance counts across
    unique decks. ``cards`` is a small dim → broadcast join."""
    return (
        deck_cards.join(F.broadcast(cards), "card_id")
        .groupBy("card_name")
        .agg(F.count(F.lit(1)).alias("appearances"))
        .orderBy(F.desc("appearances"), "card_name")
        .limit(limit)
    )


def top_deck_types(player_decks: DataFrame, decks: DataFrame, limit: int = 30) -> DataFrame:
    """F2 (queries/top_deck_types.sql, counter grain): per-archetype
    uses/wins/win_rate ranked by uses."""
    return (
        player_decks.join(decks, "deck_hash")
        .groupBy("deck_type")
        .agg(F.sum("uses").alias("uses"), F.sum("wins").alias("wins"))
        .withColumn(
            "win_rate",
            F.round(100.0 * F.col("wins") / F.nullif(F.col("uses"), F.lit(0)), 2),
        )
        .orderBy(F.desc("uses"), "deck_type")
        .limit(limit)
    )


def _legacy_rate_agg(grouped) -> DataFrame:
    """COUNT(*) / SUM(CASE WHEN win...) / ROUND(rate, 2) — the exact
    aggregate block of queries/top_deck_types.sql & top_decks.sql."""
    wins = F.sum(F.when(F.col("win"), 1).otherwise(0))
    return grouped.agg(
        F.count(F.lit(1)).alias("uses"),
        wins.alias("wins"),
        F.round(100.0 * wins / F.nullif(F.count(F.lit(1)), F.lit(0)), 2).alias(
            "win_rate"
        ),
    )


def top_deck_types_legacy(
    player_battles: DataFrame, decks: DataFrame, limit: int = 30
) -> DataFrame:
    """F2 as literally written (queries/top_deck_types.sql:1-10): the
    boolean ``pd.win`` grain. ``decks`` is a small dim → broadcast."""
    return (
        _legacy_rate_agg(
            player_battles.join(F.broadcast(decks), "deck_hash").groupBy("deck_type")
        )
        .orderBy(F.desc("uses"), "deck_type")
        .limit(limit)
    )


def top_decks_legacy(
    player_battles: DataFrame, decks: DataFrame, limit: int = 50
) -> DataFrame:
    """F4 as literally written (queries/top_decks.sql:1-11)."""
    return (
        _legacy_rate_agg(
            player_battles.join(F.broadcast(decks), "deck_hash").groupBy(
                "deck_hash", "deck_type"
            )
        )
        .orderBy(F.desc("uses"), "deck_hash")
        .limit(limit)
    )


def player_summary(player: DataFrame, player_decks: DataFrame, limit: int = 50) -> DataFrame:
    """F3 (queries/player_summary.sql): LEFT JOIN — players with no decks
    still appear; COUNT(pd.deck_hash) is non-null-only in both engines."""
    return (
        player.join(player_decks.select("player_tag", "deck_hash"), "player_tag", "left")
        .groupBy("player_tag", "player_name", "trophies")
        .agg(F.count("deck_hash").alias("decks_seen"))
        .orderBy(F.desc("trophies"), "player_tag")
        .limit(limit)
    )


def top_decks(player_decks: DataFrame, decks: DataFrame, limit: int = 50) -> DataFrame:
    """F4 (queries/top_decks.sql, counter grain): per-deck ranking."""
    return (
        player_decks.join(decks, "deck_hash")
        .groupBy("deck_hash", "deck_type")
        .agg(F.sum("uses").alias("uses"), F.sum("wins").alias("wins"))
        .withColumn(
            "win_rate",
            F.round(100.0 * F.col("wins") / F.nullif(F.col("uses"), F.lit(0)), 2),
        )
        .orderBy(F.desc("uses"), "deck_hash")
        .limit(limit)
    )


def matchup_winrates(meta_type_matchups: DataFrame, limit: int = 20) -> DataFrame:
    """F5 (scripts:535-536): matchup matrix with win rates, by volume."""
    return (
        meta_type_matchups.select(
            "deck_type",
            "opp_deck_type",
            "uses",
            "wins",
            win_rate(F.col("wins"), F.col("uses")).alias("winrate"),
        )
        .orderBy(F.desc("uses"), "deck_type", "opp_deck_type")
        .limit(limit)
    )


def best_decks_by_winrate(
    player_decks: DataFrame, min_uses: int = 5, limit: int = 10
) -> DataFrame:
    """F6 (scripts:537-538): HAVING SUM(uses) ≥ threshold, ranked by
    winrate (HAVING ≡ post-aggregation filter)."""
    return (
        player_decks.groupBy("deck_hash")
        .agg(F.sum("uses").alias("uses"), F.sum("wins").alias("wins"))
        .filter(F.col("uses") >= min_uses)
        .withColumn("winrate", win_rate(F.col("wins"), F.col("uses")))
        .orderBy(F.desc("winrate"), F.desc("uses"), "deck_hash")
        .limit(limit)
    )


def deck_integrity_violations(deck_cards: DataFrame, limit: int = 20) -> DataFrame:
    """F7/G1 (scripts:533; validate_snapshot.py:49-68): decks without
    exactly 8 cards (expected empty)."""
    return (
        deck_cards.groupBy("deck_hash")
        .agg(F.count(F.lit(1)).alias("n_cards"))
        .filter(F.col("n_cards") != 8)
        .orderBy("deck_hash")
        .limit(limit)
    )
