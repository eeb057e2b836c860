"""ClashRoyale-domain query surface for the driver: the reference's own
analysis queries (F1-F7) and warehouse tables, driven END-TO-END through
the Spark snapshot pipeline.

Each cr_* query runs ``plans.pipeline.build_snapshot`` over the committed
raw fixtures (``fixtures/battles.jsonl`` etc. — deterministic synthetic
data, seed 42) and queries the resulting tables. Its DuckDB oracle reads
``fixtures/warehouse/*.parquet`` — tables precomputed by the PURE-PYTHON
oracle ETL (``testing/cr_synthetic.oracle_etl``), an independent
re-derivation of the reference semantics sharing no code with the
pipeline. A hash match therefore verifies the entire dataflow: filter →
match-hash dedup → deck extraction → SHA1 identity → classification →
override → unpivot → rollups.

These queries are sf-independent (the fixture is fixed-size); ``sf_dir``
is accepted and ignored. The pipeline result is cached per SparkSession
so the 9 queries pay the build once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import readers
from . import pipeline as pl
from . import queries as q
from .testdata_queries import register

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE_DIR = os.path.join(_REPO, "fixtures")
_WH = os.path.join(FIXTURE_DIR, "warehouse")
TOP_N = 8  # matches tools/make_fixtures.py

# Keyed on the live session OBJECT (weakly): an id()-keyed dict could
# hand a new session cached DataFrames bound to a stopped SparkContext
# if the old session was garbage collected and its id() reused.
import weakref

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def snapshot_tables(spark: SparkSession) -> dict[str, DataFrame]:
    key = spark
    if key not in _CACHE:
        result = pl.build_snapshot(
            spark,
            battles=readers.read_battles_json(
                spark, os.path.join(FIXTURE_DIR, "battles.jsonl")
            ),
            leaderboard=readers.read_leaderboard_json(
                spark, os.path.join(FIXTURE_DIR, "leaderboard.jsonl")
            ),
            catalog=readers.read_card_catalog(
                spark, os.path.join(FIXTURE_DIR, "card_catalog.json")
            ),
            overrides=readers.read_overrides(
                spark, os.path.join(FIXTURE_DIR, "overrides.parquet")
            ),
            top_n=TOP_N,
            collect_counters=False,
        )
        _CACHE[key] = result.tables
    return _CACHE[key]


def _wh(table: str) -> str:
    return f"read_parquet('{os.path.join(_WH, table)}.parquet')"


# --- direct table parity (strongest checks) --------------------------------

@register(
    "cr_meta_deck_types",
    f"SELECT deck_type, uses, wins FROM {_wh('meta_deck_types')} ORDER BY deck_type",
)
def cr_meta_deck_types(spark, sf_dir):
    """E1 rollup, full-table parity vs the independent Python oracle ETL."""
    return snapshot_tables(spark)["meta_deck_types"].orderBy("deck_type")


@register(
    "cr_meta_type_matchups",
    f"""SELECT deck_type, opp_deck_type, uses, wins
        FROM {_wh('meta_type_matchups')} ORDER BY deck_type, opp_deck_type""",
)
def cr_meta_type_matchups(spark, sf_dir):
    """E6 directional matchup matrix (double-insert + mirrors), full parity."""
    return snapshot_tables(spark)["meta_type_matchups"].orderBy(
        "deck_type", "opp_deck_type"
    )


@register(
    "cr_meta_type_deck_ids",
    f"""SELECT deck_type, deck_hash, uses, wins
        FROM {_wh('meta_type_deck_ids')} ORDER BY deck_type, deck_hash""",
)
def cr_meta_type_deck_ids(spark, sf_dir):
    """E2 per-(archetype, deck) rollup (scripts/etl_snapshot_topn.py:
    324-326), full-table parity vs the independent Python oracle ETL."""
    return snapshot_tables(spark)["meta_type_deck_ids"].orderBy(
        "deck_type", "deck_hash"
    )


@register(
    "cr_meta_type_cards",
    f"""SELECT deck_type, card_id, card_variant, uses, wins
        FROM {_wh('meta_type_cards')}
        ORDER BY deck_type, card_id, card_variant""",
)
def cr_meta_type_cards(spark, sf_dir):
    """E3 per-(archetype, card, variant) rollup — each deck observation
    fans out ×8 card observations (scripts:328-330); full-table parity."""
    return snapshot_tables(spark)["meta_type_cards"].orderBy(
        "deck_type", "card_id", "card_variant"
    )


@register(
    "cr_player_decks",
    f"""SELECT player_tag, deck_hash, uses, wins
        FROM {_wh('player_decks')} ORDER BY player_tag, deck_hash""",
)
def cr_player_decks(spark, sf_dir):
    """E4 TopN-gated player fact, full parity (exercises the semi join)."""
    return snapshot_tables(spark)["player_decks"].orderBy("player_tag", "deck_hash")


@register(
    "cr_player_type_cards",
    f"""SELECT player_tag, deck_type, card_id, card_variant, uses, wins
        FROM {_wh('player_type_cards')}
        ORDER BY player_tag, deck_type, card_id, card_variant""",
)
def cr_player_type_cards(spark, sf_dir):
    """E5 derived sum-not-copy rollup, full parity (the trickiest E-op)."""
    return snapshot_tables(spark)["player_type_cards"].orderBy(
        "player_tag", "deck_type", "card_id", "card_variant"
    )


@register(
    "cr_deck_cards",
    f"""SELECT deck_hash, card_id, card_variant, slot
        FROM {_wh('deck_cards')} ORDER BY deck_hash, slot""",
)
def cr_deck_cards(spark, sf_dir):
    """Deck composition bridge incl. SHA1 deck identity and slot order
    under the deterministic first-seen rule."""
    return snapshot_tables(spark)["deck_cards"].orderBy("deck_hash", "slot")


@register(
    "cr_player_battles",
    f"""SELECT match_hash, battle_time, side, player_tag, deck_hash, win
        FROM {_wh('player_battles')} ORDER BY match_hash, side""",
)
def cr_player_battles(spark, sf_dir):
    """Per-battle boolean-grain fact (the grain queries/top_deck_types.sql
    & top_decks.sql assume), full-table parity vs the Python oracle."""
    return snapshot_tables(spark)["player_battles"].orderBy("match_hash", "side")


# --- the reference's analysis queries (F1-F7) ------------------------------

@register(
    "cr_f1_top_cards",
    f"""
    SELECT c.card_name, COUNT(*) AS appearances
    FROM {_wh('deck_cards')} dc JOIN {_wh('cards')} c ON c.card_id = dc.card_id
    GROUP BY c.card_name
    ORDER BY appearances DESC, c.card_name
    LIMIT 50
    """,
)
def cr_f1_top_cards(spark, sf_dir):
    """F1 (queries/top_cards_overall.sql) on pipeline output."""
    t = snapshot_tables(spark)
    return q.top_cards_overall(t["deck_cards"], t["cards"])


@register(
    "cr_f2_top_deck_types",
    f"""
    SELECT d.deck_type,
           CAST(SUM(pd.uses) AS BIGINT) AS uses,
           CAST(SUM(pd.wins) AS BIGINT) AS wins,
           ROUND(100.0 * SUM(pd.wins) / NULLIF(SUM(pd.uses), 0), 2) AS win_rate
    FROM {_wh('player_decks')} pd JOIN {_wh('decks')} d ON d.deck_hash = pd.deck_hash
    GROUP BY d.deck_type
    ORDER BY uses DESC, d.deck_type
    LIMIT 30
    """,
)
def cr_f2_top_deck_types(spark, sf_dir):
    """F2 (queries/top_deck_types.sql, counter grain) on pipeline output."""
    t = snapshot_tables(spark)
    return q.top_deck_types(t["player_decks"], t["decks"])


@register(
    "cr_f3_player_summary",
    f"""
    SELECT p.player_tag, p.player_name, p.trophies,
           COUNT(pd.deck_hash) AS decks_seen
    FROM {_wh('player')} p
    LEFT JOIN {_wh('player_decks')} pd ON pd.player_tag = p.player_tag
    GROUP BY p.player_tag, p.player_name, p.trophies
    ORDER BY p.trophies DESC, p.player_tag
    LIMIT 50
    """,
)
def cr_f3_player_summary(spark, sf_dir):
    """F3 (queries/player_summary.sql): LEFT JOIN + COUNT(col) non-null."""
    t = snapshot_tables(spark)
    return q.player_summary(t["player"], t["player_decks"])


@register(
    "cr_f4_top_decks",
    f"""
    SELECT d.deck_hash, d.deck_type,
           CAST(SUM(pd.uses) AS BIGINT) AS uses,
           CAST(SUM(pd.wins) AS BIGINT) AS wins,
           ROUND(100.0 * SUM(pd.wins) / NULLIF(SUM(pd.uses), 0), 2) AS win_rate
    FROM {_wh('player_decks')} pd JOIN {_wh('decks')} d ON d.deck_hash = pd.deck_hash
    GROUP BY d.deck_hash, d.deck_type
    ORDER BY uses DESC, d.deck_hash
    LIMIT 50
    """,
)
def cr_f4_top_decks(spark, sf_dir):
    """F4 (queries/top_decks.sql, counter grain)."""
    t = snapshot_tables(spark)
    return q.top_decks(t["player_decks"], t["decks"])


def cr_f5_matchup_winrates(spark, sf_dir):
    """F5 (scripts/etl_snapshot_topn.py:535-536).

    UNREGISTERED in r7 (50-row cap rotation): this is a projection +
    ratio over ``meta_type_matchups``, whose every row is already
    hash-checked by ``cr_meta_type_matchups``; the winrate expression
    itself is pinned by tests/test_plans.py. Slot went to the r6
    operator crop (plans/llm_queries.py)."""
    t = snapshot_tables(spark)
    return q.matchup_winrates(t["meta_type_matchups"])


@register(
    "cr_f6_best_decks",
    f"""
    SELECT deck_hash,
           CAST(SUM(uses) AS BIGINT) AS uses,
           CAST(SUM(wins) AS BIGINT) AS wins,
           CAST(SUM(wins) AS DOUBLE) / NULLIF(SUM(uses), 0) AS winrate
    FROM {_wh('player_decks')}
    GROUP BY deck_hash
    HAVING SUM(uses) >= 5
    ORDER BY winrate DESC, uses DESC, deck_hash
    LIMIT 10
    """,
)
def cr_f6_best_decks(spark, sf_dir):
    """F6 (scripts:537-538): winrate ranking with support threshold."""
    t = snapshot_tables(spark)
    return q.best_decks_by_winrate(t["player_decks"], min_uses=5)


def cr_f7_deck_integrity(spark, sf_dir):
    """F7/G1 (scripts:533): must be empty — every deck has 8 cards.

    UNREGISTERED in r7 (50-row cap rotation): the result is empty at
    every driver run (0 rows = clean), so the hash check compared
    empty to empty and verified nothing — the same reasoning that
    rotated out ``embedding_lsh_neardup`` in r6. The 8-cards invariant
    it queries is independently driver-checked by ``cr_g_validation``
    (G1 row) and its violation-detection semantics are pinned by
    tests/test_plans.py on seeded-corruption input. Slot went to the
    r6 operator crop (plans/llm_queries.py)."""
    t = snapshot_tables(spark)
    return q.deck_integrity_violations(t["deck_cards"])


@register(
    "cr_legacy_grain_rollups",
    f"""
    SELECT * FROM (
      SELECT 'deck_type' AS grain, CAST(NULL AS VARCHAR) AS deck_hash,
             d.deck_type,
             COUNT(*) AS uses,
             CAST(SUM(CASE WHEN pb.win THEN 1 ELSE 0 END) AS BIGINT) AS wins,
             ROUND(100.0 * SUM(CASE WHEN pb.win THEN 1 ELSE 0 END)
                   / NULLIF(COUNT(*), 0), 2) AS win_rate
      FROM {_wh('player_battles')} pb
      JOIN {_wh('decks')} d ON d.deck_hash = pb.deck_hash
      GROUP BY d.deck_type
      ORDER BY uses DESC, d.deck_type
      LIMIT 30
    )
    UNION ALL
    SELECT * FROM (
      SELECT 'deck' AS grain, d.deck_hash, d.deck_type,
             COUNT(*) AS uses,
             CAST(SUM(CASE WHEN pb.win THEN 1 ELSE 0 END) AS BIGINT) AS wins,
             ROUND(100.0 * SUM(CASE WHEN pb.win THEN 1 ELSE 0 END)
                   / NULLIF(COUNT(*), 0), 2) AS win_rate
      FROM {_wh('player_battles')} pb
      JOIN {_wh('decks')} d ON d.deck_hash = pb.deck_hash
      GROUP BY d.deck_hash, d.deck_type
      ORDER BY uses DESC, d.deck_hash
      LIMIT 50
    )
    """,
)
def cr_legacy_grain_rollups(spark, sf_dir):
    """queries/top_deck_types.sql:1-10 and top_decks.sql:1-11 AS WRITTEN
    (boolean ``pd.win`` grain) over the ``player_battles`` fact — one
    result set, tagged by grain, so both legacy forms earn a single
    driver correctness row (the hash compare is order-insensitive; each
    arm's LIMIT keeps its own deterministic tie-break)."""
    t = snapshot_tables(spark)
    by_type = q.top_deck_types_legacy(t["player_battles"], t["decks"]).select(
        F.lit("deck_type").alias("grain"),
        F.lit(None).cast("string").alias("deck_hash"),
        "deck_type",
        "uses",
        "wins",
        "win_rate",
    )
    by_deck = q.top_decks_legacy(t["player_battles"], t["decks"]).select(
        F.lit("deck").alias("grain"),
        "deck_hash",
        "deck_type",
        "uses",
        "wins",
        "win_rate",
    )
    return by_type.unionAll(by_deck)


# --- library path (B2/E8), E7 counters, G validation suite -----------------

def _battles(spark):
    return readers.read_battles_json(
        spark, os.path.join(FIXTURE_DIR, "battles.jsonl")
    )


def _catalog(spark):
    return readers.read_card_catalog(
        spark, os.path.join(FIXTURE_DIR, "card_catalog.json")
    )


def cr_b2_normalized(spark, sf_dir):
    """B2 library-path normalization (battle_filters.py:52-97): ranked
    filter + projection, duplicates kept (this path never dedups). Card
    lists flatten to '|'-joined strings for the scalar hash compare;
    oracle = the committed golden parquet from the pure-Python
    re-derivation (testing/cr_synthetic.py_normalize_battles).

    UNREGISTERED in r7 (50-row cap rotation): ``cr_e8_library_summary``
    consumes this exact normalize output (E8 derives from B2), so its
    hash check covers the B2 path end-to-end; the projection itself
    stays verified by tests/test_library.py and by this callable in
    tests/test_driver_contract-style pytest runs. Slot went to the r6
    operator crop (chunk_by_chars / lm_perplexity /
    semantic_neardup_pairs in plans/llm_queries.py)."""
    from . import library

    norm = library.normalize_battles(_battles(spark))
    return norm.select(
        "battle_time",
        "result",
        "mode_name",
        F.concat_ws("|", "my_cards").alias("my_cards_str"),
        F.concat_ws("|", "opp_cards").alias("opp_cards_str"),
    ).orderBy("battle_time", "my_cards_str", "opp_cards_str")


@register(
    "cr_e8_library_summary",
    f"""
    SELECT side, deck_type, games, wins, losses, draws, win_rate
    FROM {_wh('library_summary')}
    ORDER BY side, deck_type
    """,
)
def cr_e8_library_summary(spark, sf_dir):
    """E8 library summary (deck_type.py:192-274): per-archetype
    games/wins/losses/draws/win_rate for my side AND the opponent side
    with perspective flipped; 8-card sides only. Oracle = golden parquet
    from the independent Python re-derivation."""
    from . import library

    norm = library.normalize_battles(_battles(spark))
    mine, opp = library.summarize_deck_types(norm, _catalog(spark))

    def side(df, label):
        return df.select(
            F.lit(label).alias("side"),
            F.col("type").alias("deck_type"),
            "games",
            "wins",
            "losses",
            "draws",
            "win_rate",
        )

    return side(mine, "mine").unionAll(side(opp, "opponent")).orderBy(
        "side", "deck_type"
    )


@register(
    "cr_e7_scan_counters",
    f"SELECT counter, value FROM {_wh('counters')} ORDER BY counter",
)
def cr_e7_scan_counters(spark, sf_dir):
    """E7 scan counters (scripts:249,261) as a relational report:
    entries scanned / ranked kept / matches after dedup / battles
    surviving validation. Oracle = counts recorded by the Python oracle
    ETL over the same fixtures."""
    return pl.scan_counters_report(_battles(spark), _catalog(spark)).orderBy(
        "counter"
    )


_G_SQL_CHECKS = [
    (
        "deck_cards_8_rows",
        f"""(SELECT COUNT(*) FROM (SELECT deck_hash FROM {_wh('deck_cards')}
             GROUP BY deck_hash HAVING COUNT(*) <> 8) t)""",
    ),
    *[
        (
            f"wins_uses_sanity:{t}",
            f"(SELECT COUNT(*) FROM {_wh(t)} WHERE wins > uses OR wins < 0 OR uses < 0)",
        )
        for t in (
            "player_decks",
            "meta_deck_types",
            "meta_type_deck_ids",
            "meta_type_cards",
            "player_type_cards",
            "meta_type_matchups",
        )
    ],
    (
        "non_empty_meta",
        f"(SELECT CASE WHEN COUNT(*) > 0 THEN 0 ELSE 1 END FROM {_wh('meta_deck_types')})",
    ),
    (
        "unknown_ratio",
        f"""(SELECT CASE WHEN COALESCE(SUM(CASE WHEN lower(deck_type) = 'unknown'
             THEN uses END), 0) * 10 <= COALESCE(SUM(uses), 0) * 3
             THEN 0 ELSE 1 END FROM {_wh('meta_deck_types')})""",
    ),
    (
        "topn_meta_bound",
        f"""(SELECT CASE WHEN t.s <= m.s AND m.s <= 2 * t.s THEN 0 ELSE 1 END
             FROM (SELECT COALESCE(SUM(uses), 0) AS s FROM {_wh('player_decks')}) t,
                  (SELECT COALESCE(SUM(uses), 0) AS s FROM {_wh('meta_deck_types')}) m)""",
    ),
    (
        "player_count",
        f"(SELECT CASE WHEN COUNT(*) = {TOP_N} THEN 0 ELSE 1 END FROM {_wh('player')})",
    ),
    *[
        (
            f"fk:{child}.{ck}->{parent}.{pk}",
            f"""(SELECT COUNT(*) FROM {_wh(child)} c WHERE NOT EXISTS
                 (SELECT 1 FROM {_wh(parent)} p WHERE p.{pk} = c.{ck}))""",
        )
        for child, ck, parent, pk in [
            ("deck_cards", "deck_hash", "decks", "deck_hash"),
            ("player_decks", "deck_hash", "decks", "deck_hash"),
            ("player_decks", "player_tag", "player", "player_tag"),
            ("decks", "deck_type", "deck_types", "deck_type"),
            ("meta_type_deck_ids", "deck_hash", "decks", "deck_hash"),
        ]
    ],
]

_G_VALIDATION_SQL = (
    "WITH checks(check_name, violations) AS ("
    + " UNION ALL ".join(f"SELECT '{n}', {sql}" for n, sql in _G_SQL_CHECKS)
    + """)
    SELECT check_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM checks ORDER BY check_name"""
)


@register(
    "cr_streaming_dedup",
    f"""SELECT counter, value FROM {_wh('counters')}
        WHERE counter = 'stream_deduped_matches'""",
)
def cr_streaming_dedup(spark, sf_dir):
    """Streaming-vs-batch equivalence, driver-visible: run the REAL
    Structured Streaming dedup twin of D2 (file source over a landing
    dir → ranked filter → watermarked ``dropDuplicatesWithinWatermark``
    on match_hash, streaming/incremental.py) with an availableNow
    trigger into a memory sink, and return the deduped-match count. The
    oracle is the ``stream_deduped_matches`` counter the PURE-PYTHON
    oracle ETL computed over the same fixture (matches whose battleTime
    parses as the watermark event time — malformed-time edge-case
    battles are exactly the rows the streaming path must drop)."""
    import os as _os
    import shutil
    import tempfile

    from ..streaming import incremental

    landing = tempfile.mkdtemp(prefix="cr_stream_landing_")
    ckpt = tempfile.mkdtemp(prefix="cr_stream_ckpt_")
    try:
        shutil.copy(_os.path.join(FIXTURE_DIR, "battles.jsonl"), landing)
        stream = incremental.stream_battles(spark, landing)
        deduped = incremental.streaming_dedup_matches(pl.ranked_battles(stream))
        qname = "mem_" + _os.path.basename(landing)
        (
            deduped.select("match_hash")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return spark.table(qname).agg(
            F.count(F.lit(1)).cast("long").alias("value")
        ).select(F.lit("stream_deduped_matches").alias("counter"), "value")
    finally:
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@register("cr_g_validation", _G_VALIDATION_SQL)
def cr_g_validation(spark, sf_dir):
    """G1-G6 + FK integrity (validate_snapshot.py:49-206) as one
    relational result set over the live pipeline output — each check is
    a small aggregate; the oracle recomputes every check in SQL against
    the independent oracle ETL's warehouse."""
    from . import validate

    return validate.validation_report(
        snapshot_tables(spark), expected_top_n=TOP_N
    ).orderBy("check_name")
