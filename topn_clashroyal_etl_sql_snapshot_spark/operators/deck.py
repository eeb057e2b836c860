"""Deck extraction, validation, feature computation and classification.

Reference behaviors reproduced (all paths under ``/root/reference/``):

- B6  ``_extract_8_cards`` (scripts/etl_snapshot_topn.py:77-108): take the
      first 8 cards, slot = 1..8, name fallback from the catalog, reject
      the deck if <8 cards or the 8 ``(card_id, variant)`` pairs are not
      unique.
- C1  ``_precompute_deck_values`` (src/analysist/deck_type.py:38-82):
      avg_elixir (sum/8), four-card cycle cost (sum of 4 cheapest),
      has_xbow/has_mortar, bait/bridge-spam/big-tank counts; defaults
      avg=3.0 / cycle=12.0 when no card resolves elixir data.
- C2  ``classify_deck`` (src/analysist/deck_type.py:85-152): priority
      rules, first match wins: Siege → Bait → Cycle → Bridge Spam →
      Beatdown → Hybrid.
- C3  override application (scripts/etl_snapshot_topn.py:290-291):
      ``overrides[deck_hash]`` beats the classifier.

Everything is array/aggregate column algebra over the 8-card array — no
Python UDFs, no extra shuffle: features and classification are computed
per-deck from the card array *before* any explode, so the classifier adds
zero exchanges to the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import exprs

ARCHETYPES = ("Siege", "Bait", "Cycle", "Bridge Spam", "Beatdown", "Hybrid")


# ---------------------------------------------------------------------------
# B6 — extract + validate the 8-card deck (array form, no explode needed)
# ---------------------------------------------------------------------------

def extract_deck(cards: Column, catalog_by_id: Column) -> Column:
    """Build ``array<struct<card_id, card_name, card_variant, slot>>`` or NULL.

    ``cards`` is the raw ``array<struct<id, name, evolutionLevel>>``;
    ``catalog_by_id`` is a ``map<bigint, string>`` (card_id → name) for the
    name fallback (B10, src/clashdb/card_metadata.py:20-25). NULL result ≡
    the reference returning ``None`` (battle later discarded).

    Validity (scripts/etl_snapshot_topn.py:82-107): ≥8 cards present, a
    card with null id invalidates the deck, and the 8 ``(id, variant)``
    pairs must be distinct.
    """
    first8 = F.slice(cards, 1, 8)
    obs = F.transform(
        first8,
        lambda c, i: F.struct(
            c["id"].alias("card_id"),
            F.coalesce(
                F.nullif(F.trim(c["name"]), F.lit("")),
                F.element_at(catalog_by_id, c["id"]),
                F.lit(""),
            ).alias("card_name"),
            exprs.card_variant(c["evolutionLevel"]).alias("card_variant"),
            (i + F.lit(1)).cast("int").alias("slot"),
        ),
    )
    n_cards = F.size(F.coalesce(cards, F.array()))
    has_null_id = F.exists(first8, lambda c: c["id"].isNull())
    n_unique_pairs = F.size(
        F.array_distinct(
            F.transform(obs, lambda o: F.struct(o["card_id"], o["card_variant"]))
        )
    )
    valid = (n_cards >= 8) & ~has_null_id & (n_unique_pairs == 8)
    return F.when(valid, obs)


def deck_hash_from_obs(obs: Column) -> Column:
    """Deck hash from the extracted observation array (B8 glue,
    scripts/etl_snapshot_topn.py:140-143)."""
    pairs = F.transform(
        obs,
        lambda o: F.struct(
            o["card_id"].cast("string").alias("cid"),
            o["card_variant"].alias("variant"),
        ),
    )
    return exprs.deck_hash(pairs)


# ---------------------------------------------------------------------------
# C1 — per-deck features from card names + catalog maps
# ---------------------------------------------------------------------------

def deck_features(card_names: Column, elixir_by_name: Column,
                  bait_by_name: Column, spam_by_name: Column,
                  tank_by_name: Column) -> Column:
    """Compute the classifier feature struct from an array of card names.

    The catalog arrives as broadcast-able ``map<string, X>`` literals /
    columns keyed by card name (the reference keys its metadata dict by
    name, src/analysist/deck_type.py:16). Unknown names contribute no
    elixir and false flags, exactly like ``_CARD_META_BY_NAME.get(c, {})``.
    """
    elixirs = F.filter(
        F.transform(card_names, lambda n: F.element_at(elixir_by_name, n)),
        lambda e: e.isNotNull(),
    )
    n_elixir = F.size(elixirs)
    # sum of the 4 cheapest (sorted ascending, take 4) — deck_type.py:61
    four_cheapest = F.aggregate(
        F.slice(F.array_sort(elixirs), 1, 4),
        F.lit(0.0),
        lambda acc, e: acc + e.cast("double"),
    )
    total_elixir = F.aggregate(
        elixirs, F.lit(0.0), lambda acc, e: acc + e.cast("double")
    )

    def _flag_count(m: Column) -> Column:
        return F.size(
            F.filter(card_names, lambda n: F.coalesce(F.element_at(m, n), F.lit(False)))
        )

    return F.struct(
        # avg over 8 regardless of how many resolved — deck_type.py:59
        F.when(n_elixir == 0, F.lit(3.0))
        .otherwise(total_elixir / F.lit(8.0))
        .alias("avg_elixir"),
        F.when(n_elixir == 0, F.lit(12.0)).otherwise(four_cheapest).alias(
            "four_card_cycle_cost"
        ),
        F.array_contains(card_names, "X-Bow").alias("has_xbow"),
        F.array_contains(card_names, "Mortar").alias("has_mortar"),
        _flag_count(bait_by_name).alias("bait_pieces"),
        _flag_count(spam_by_name).alias("bridge_spam_count"),
        _flag_count(tank_by_name).alias("big_tank_count"),
    )


# ---------------------------------------------------------------------------
# C2 — rule classifier (when-chain encodes rule priority)
# ---------------------------------------------------------------------------

def classify(features: Column, card_names: Column) -> Column:
    """First-match-wins archetype rules (src/analysist/deck_type.py:110-152).

    Empty/null deck → Hybrid (deck_type.py:97-98).
    """
    f = features
    return (
        F.when(F.size(F.coalesce(card_names, F.array())) == 0, F.lit("Hybrid"))
        .when(f["has_xbow"], F.lit("Siege"))
        .when(f["has_mortar"], F.lit("Siege"))
        .when(f["bait_pieces"] >= 3, F.lit("Bait"))
        .when(f["four_card_cycle_cost"] <= 9, F.lit("Cycle"))
        .when(f["bridge_spam_count"] >= 2, F.lit("Bridge Spam"))
        .when((f["big_tank_count"] >= 1) & (f["avg_elixir"] >= 3.5), F.lit("Beatdown"))
        .otherwise(F.lit("Hybrid"))
    )


def classify_cards(card_names: Column, elixir_by_name: Column,
                   bait_by_name: Column, spam_by_name: Column,
                   tank_by_name: Column) -> Column:
    """C1 + C2 in one expression over an array of card names.

    The reference classifies over non-empty names only
    (scripts/etl_snapshot_topn.py:287-288 filters falsy names before
    calling ``classify_deck``) — mirror that here.
    """
    names = F.filter(
        F.coalesce(card_names, F.array()),
        lambda n: n.isNotNull() & (n != ""),
    )
    return classify(
        deck_features(names, elixir_by_name, bait_by_name, spam_by_name, tank_by_name),
        names,
    )


# ---------------------------------------------------------------------------
# Catalog → broadcastable map literals
# ---------------------------------------------------------------------------

def catalog_maps(catalog: DataFrame) -> dict[str, Column]:
    """Collect the (tiny, ≤121-row) card catalog into map literals.

    The catalog is the reference's in-process dict
    (src/analysist/deck_type.py:12-16; src/clashdb/card_metadata.py:11-17).
    As map *literals* the lookups are pure expressions — no join, no
    shuffle, constant-folded into codegen; at 100 TB this is strictly
    better than even a broadcast join for a 121-entry dimension.
    """
    rows = catalog.select(
        "id", "name", "elixir", "is_big_tank", "is_bait_piece", "is_bridge_spam_piece"
    ).collect()

    # One `F.expr("map(...)")` per map instead of ~240 `F.lit` Column
    # objects: the literal tree is built by the JVM SQL parser in a
    # single py4j round-trip instead of hundreds.
    def _sql_lit(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return str(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    def _map(pairs) -> Column:
        items = [
            f"{_sql_lit(k)}, {_sql_lit(v)}"
            for k, v in pairs
            if k is not None and v is not None
        ]
        if not items:
            return F.map_from_arrays(F.array(), F.array())
        return F.expr("map(" + ", ".join(items) + ")")

    return {
        "name_by_id": _map((r["id"], r["name"]) for r in rows),
        "elixir_by_name": _map((r["name"], r["elixir"]) for r in rows),
        "bait_by_name": _map((r["name"], r["is_bait_piece"]) for r in rows),
        "spam_by_name": _map((r["name"], r["is_bridge_spam_piece"]) for r in rows),
        "tank_by_name": _map((r["name"], r["is_big_tank"]) for r in rows),
    }
