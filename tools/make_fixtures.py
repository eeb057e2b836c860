#!/usr/bin/env python
"""Generate the committed ClashRoyale-domain fixtures under fixtures/:

- battles.jsonl / leaderboard.jsonl / card_catalog.json / overrides.parquet
  — deterministic synthetic raw inputs (seed=42)
- warehouse/*.parquet — the warehouse tables computed by the PURE-PYTHON
  oracle ETL (testing/cr_synthetic.oracle_etl), i.e. an implementation
  of the reference semantics that shares no code with the Spark pipeline.

The driver-facing domain queries (plans/domain_queries.py) run the Spark
pipeline over the raw inputs while their DuckDB oracles read these
committed warehouse tables — so every CORRECTNESS row for a cr_* query
is a cross-check of the whole pipeline against an independent oracle.

Run once and commit the outputs; rerunning reproduces identical bytes
(fixed seed, stable dict/category orders).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from topn_clashroyal_etl_sql_snapshot_spark.testing.cr_synthetic import (  # noqa: E402
    CATALOG_ROWS,
    generate_fixture,
    oracle_etl,
    py_library_summary,
    py_normalize_battles,
)

FIXTURES = REPO / "fixtures"
TOP_N = 8
N_PLAYERS = 12
N_BATTLES = 400


def main() -> None:
    FIXTURES.mkdir(exist_ok=True)
    (FIXTURES / "warehouse").mkdir(exist_ok=True)

    leaderboard, battles, overrides = generate_fixture(
        seed=42, n_players=N_PLAYERS, n_battles=N_BATTLES
    )

    with open(FIXTURES / "leaderboard.jsonl", "w") as f:
        for row in leaderboard:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    with open(FIXTURES / "battles.jsonl", "w") as f:
        for b in battles:
            f.write(json.dumps(b, sort_keys=True) + "\n")
    with open(FIXTURES / "card_catalog.json", "w") as f:
        json.dump(CATALOG_ROWS, f, indent=1, sort_keys=True)
    pd.DataFrame(overrides).to_parquet(FIXTURES / "overrides.parquet", index=False)

    o = oracle_etl(leaderboard, battles, overrides, TOP_N)

    def write(name: str, df: pd.DataFrame) -> None:
        df.to_parquet(FIXTURES / "warehouse" / f"{name}.parquet", index=False)

    write(
        "player",
        pd.DataFrame(o["player"]).astype(
            {"trophies": "int64", "rank_global": "int32"}
        ),
    )
    write("deck_types", pd.DataFrame({"deck_type": o["deck_types"]}))
    write(
        "cards",
        pd.DataFrame(
            sorted(o["cards"].items()), columns=["card_id", "card_name"]
        ).astype({"card_id": "int64"}),
    )
    write(
        "decks",
        pd.DataFrame(
            sorted(o["decks"].items()), columns=["deck_hash", "deck_type"]
        ),
    )
    write(
        "deck_cards",
        pd.DataFrame(
            [
                (dh, cid, var, slot)
                for dh, obs in sorted(o["deck_cards"].items())
                for (cid, _, var, slot) in obs
            ],
            columns=["deck_hash", "card_id", "card_variant", "slot"],
        ).astype({"card_id": "int64", "slot": "int32"}),
    )

    def counters(name: str, keys: list[str]) -> None:
        rows = [
            tuple(k if isinstance(k, tuple) else (k,)) + (u, w)
            for k, (u, w) in sorted(o[name].items())
        ]
        df = pd.DataFrame(rows, columns=keys + ["uses", "wins"]).astype(
            {"uses": "int64", "wins": "int64"}
        )
        write(name, df)

    write(
        "player_battles",
        pd.DataFrame(
            sorted(
                o["player_battles"],
                key=lambda r: (r["match_hash"], r["side"]),
            )
        ).astype({"side": "int32", "win": "bool"}),
    )
    counters("player_decks", ["player_tag", "deck_hash"])
    counters("meta_deck_types", ["deck_type"])
    counters("meta_type_deck_ids", ["deck_type", "deck_hash"])
    counters("meta_type_cards", ["deck_type", "card_id", "card_variant"])
    counters("player_type_cards", ["player_tag", "deck_type", "card_id", "card_variant"])
    counters("meta_type_matchups", ["deck_type", "opp_deck_type"])

    # library path (B2 normalize + E8 summary) — card lists flattened to
    # '|'-joined strings so the cross-engine hash compare stays scalar
    normalized = py_normalize_battles(battles)
    write(
        "library_normalized",
        pd.DataFrame(
            [
                {
                    "battle_time": r["battle_time"],
                    "result": r["result"],
                    "mode_name": r["mode_name"],
                    "my_cards_str": "|".join(r["my_cards"]),
                    "opp_cards_str": "|".join(r["opp_cards"]),
                }
                for r in normalized
            ]
        ),
    )
    write(
        "library_summary",
        pd.DataFrame(py_library_summary(normalized)).astype(
            {"games": "int64", "wins": "int64", "losses": "int64", "draws": "int64"}
        ),
    )

    # E7 scan counters
    write(
        "counters",
        pd.DataFrame(
            sorted(o["counters"].items()), columns=["counter", "value"]
        ).astype({"value": "int64"}),
    )

    print(f"wrote fixtures to {FIXTURES} (deduped_matches={o['deduped_matches']})")


if __name__ == "__main__":
    main()
