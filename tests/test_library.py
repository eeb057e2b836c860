"""Library-path tests (B2 normalize + E8 summarize): Spark vs a direct
Python re-derivation of the reference semantics on the battle fixture."""

from __future__ import annotations

from collections import defaultdict

import pytest

from topn_clashroyal_etl_sql_snapshot_spark.plans import library
from topn_clashroyal_etl_sql_snapshot_spark.sources.schemas import (
    BATTLE_SCHEMA,
    CARD_METADATA_SCHEMA,
)
from topn_clashroyal_etl_sql_snapshot_spark.testing.cr_synthetic import (
    CATALOG_ROWS,
    RANKED_MODES,
    generate_fixture,
    py_classify,
)


def _py_normalize(battles):
    out = []
    for b in battles:
        team, opp = b.get("team"), b.get("opponent")
        if not isinstance(team, list) or not isinstance(opp, list):
            continue
        if len(team) != 1 or len(opp) != 1:
            continue
        if (b.get("gameMode") or {}).get("id") not in RANKED_MODES:
            continue
        tc = int(team[0].get("crowns") or 0)
        oc = int(opp[0].get("crowns") or 0)
        result = "win" if tc > oc else ("loss" if tc < oc else "draw")

        def names(side):
            return [
                (c.get("name") or "").strip()
                for c in (side.get("cards") or [])
                if isinstance(c, dict) and c.get("name")
            ]

        gm = b.get("gameMode") or {}
        out.append(
            {
                "battle_time": b.get("battleTime"),
                "result": result,
                "my_cards": names(team[0]),
                "opp_cards": names(opp[0]),
                "mode_name": gm.get("name") or (b.get("type") or ""),
            }
        )
    return out


def _py_summarize(normalized):
    my, opp = {}, {}

    def bucket(d, k):
        return d.setdefault(k, defaultdict(int))

    for b in normalized:
        res = b["result"]
        if len(b["my_cards"]) == 8:
            s = bucket(my, py_classify(b["my_cards"]))
            s["games"] += 1
            s["wins" if res == "win" else "losses" if res == "loss" else "draws"] += 1
        if len(b["opp_cards"]) == 8:
            s = bucket(opp, py_classify(b["opp_cards"]))
            s["games"] += 1
            # perspective flip
            s["losses" if res == "win" else "wins" if res == "loss" else "draws"] += 1
    return my, opp


@pytest.fixture(scope="module")
def data(spark):
    _, battles, _ = generate_fixture()
    df = spark.createDataFrame(battles, BATTLE_SCHEMA)
    cat = spark.createDataFrame(CATALOG_ROWS, CARD_METADATA_SCHEMA)
    return battles, df, cat


def test_normalize_matches_python(spark, data):
    battles, df, _ = data
    got = [r.asDict() for r in library.normalize_battles(df).collect()]
    want = _py_normalize(battles)
    key = lambda d: (d["battle_time"], d["result"], tuple(d["my_cards"]))
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert len(got_s) == len(want_s)
    for g, w in zip(got_s, want_s):
        assert g["result"] == w["result"]
        assert list(g["my_cards"]) == w["my_cards"]
        assert list(g["opp_cards"]) == w["opp_cards"]
        assert g["mode_name"] == w["mode_name"]


def test_summarize_matches_python_with_flip_and_draws(spark, data):
    battles, df, cat = data
    normalized = library.normalize_battles(df)
    my_df, opp_df = library.summarize_deck_types(normalized, cat)
    my_py, opp_py = _py_summarize(_py_normalize(battles))

    for got_df, want in ((my_df, my_py), (opp_df, opp_py)):
        got = {r["type"]: r for r in got_df.collect()}
        assert set(got) == set(want)
        for t, s in want.items():
            g = got[t]
            assert (g["games"], g["wins"], g["losses"], g["draws"]) == (
                s["games"],
                s["wins"],
                s["losses"],
                s["draws"],
            ), t
            assert g["wins"] + g["losses"] + g["draws"] == g["games"]

    # draws exist in the fixture and are tracked (unlike the ETL grain)
    assert sum(s["draws"] for s in my_py.values()) > 0
    # ordering: win_rate desc then games desc
    rates = [(r["win_rate"], r["games"]) for r in my_df.collect()]
    assert rates == sorted(rates, reverse=True)
