"""Synthetic ClashRoyale-domain fixtures: card catalog, deck templates,
battle generator, and a pure-Python oracle ETL re-deriving the reference
semantics (used to verify the Spark pipeline table-for-table).

The generator covers every edge case listed in FIXTURES.md §1.2:
non-1v1 battles, non-whitelisted modes, exact-duplicate battlelog entries,
short/duplicate-pair decks, missing card names, draws, and battles where
neither/one/both participants are TopN players.
"""

from __future__ import annotations

import hashlib
import json
import random
import re
from collections import defaultdict

# name, elixir, big_tank, bait, bridge_spam  (synthetic catalog — covers
# every classifier flag; NOT the reference's card_metadata.json)
CATALOG = [
    (101, "X-Bow", 6, False, False, False),
    (102, "Mortar", 4, False, False, False),
    (103, "Goblin Barrel", 3, False, True, False),
    (104, "Princess", 3, False, True, False),
    (105, "Goblin Gang", 3, False, True, False),
    (106, "Skeletons", 1, False, False, False),
    (107, "Ice Spirit", 1, False, False, False),
    (108, "Ice Golem", 2, False, False, False),
    (109, "The Log", 2, False, False, False),
    (110, "Bandit", 3, False, False, True),
    (111, "Battle Ram", 4, False, False, True),
    (112, "Golem", 8, True, False, False),
    (113, "Mega Knight", 7, True, False, False),
    (114, "Baby Dragon", 4, False, False, False),
    (115, "Night Witch", 4, False, False, False),
    (116, "Lightning", 6, False, False, False),
    (117, "Tornado", 3, False, False, False),
    (118, "Musketeer", 4, False, False, False),
    (119, "Knight", 3, False, False, False),
    (120, "Fireball", 4, False, False, False),
]

CATALOG_ROWS = [
    {
        "id": cid,
        "name": name,
        "maxLevel": 14,
        "elixir": elixir,
        "is_big_tank": tank,
        "is_bait_piece": bait,
        "is_bridge_spam_piece": spam,
    }
    for cid, name, elixir, tank, bait, spam in CATALOG
]

_BY_NAME = {name: (cid, elixir, tank, bait, spam) for cid, name, elixir, tank, bait, spam in CATALOG}
_BY_ID = {cid: name for cid, name, *_ in CATALOG}

# Deck templates — one per classifier branch + extras (8 names each)
DECK_TEMPLATES = [
    ["X-Bow", "Knight", "Musketeer", "Fireball", "Golem", "Baby Dragon", "Tornado", "Lightning"],
    ["Mortar", "Knight", "Musketeer", "Fireball", "Bandit", "Baby Dragon", "Tornado", "Lightning"],
    ["Goblin Barrel", "Princess", "Goblin Gang", "Knight", "Musketeer", "Fireball", "The Log", "Tornado"],
    ["Skeletons", "Ice Spirit", "Ice Golem", "The Log", "Musketeer", "Fireball", "Knight", "Tornado"],
    ["Bandit", "Battle Ram", "Knight", "Musketeer", "Fireball", "Baby Dragon", "Tornado", "Lightning"],
    ["Golem", "Night Witch", "Baby Dragon", "Lightning", "Tornado", "Musketeer", "Fireball", "Knight"],
    ["Knight", "Musketeer", "Fireball", "Baby Dragon", "Tornado", "The Log", "Ice Golem", "Night Witch"],
    ["Mega Knight", "Skeletons", "Ice Spirit", "Ice Golem", "The Log", "Knight", "Princess", "Tornado"],
]

RANKED_MODES = (72000006, 72000464)


def make_deck(template_idx: int, evo_first: bool = False) -> list[dict]:
    """Template → raw card dicts; optionally mark the first card evo."""
    cards = []
    for i, name in enumerate(DECK_TEMPLATES[template_idx]):
        cid = _BY_NAME[name][0]
        cards.append(
            {
                "id": cid,
                "name": name,
                "evolutionLevel": 1 if (evo_first and i == 0) else 0,
            }
        )
    return cards


def make_battle(ts, mode_id, team_tag, team_crowns, team_cards, opp_tag, opp_crowns, opp_cards, btype="pathOfLegend"):
    return {
        "battleTime": ts,
        "type": btype,
        "gameMode": {"id": mode_id, "name": "Ranked1v1" if mode_id == 72000464 else "Ladder"},
        "team": [{"tag": team_tag, "crowns": team_crowns, "cards": team_cards}],
        "opponent": [{"tag": opp_tag, "crowns": opp_crowns, "cards": opp_cards}],
    }


def generate_fixture(seed: int = 42, n_players: int = 8, n_battles: int = 60):
    """Returns (leaderboard_rows, battle_rows, override_rows)."""
    rng = random.Random(seed)
    tags = [f"#P{i}" for i in range(1, n_players + 1)]
    leaderboard = []
    for i, tag in enumerate(tags, start=1):
        row = {"tag": tag.lower().lstrip("#") if i % 3 == 0 else tag, "name": f"Player {i}", "rank": i}
        # eloRating for most, trophies for some, neither for one
        if i == 5:
            row["trophies"] = 9000 - i
        elif i == 7:
            pass  # neither → ladder value 0
        else:
            row["eloRating"] = 2000 - i
        leaderboard.append(row)

    battles: list[dict] = []
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 9, 0, 0, 0)
    for b in range(n_battles):
        ts = (t0 + timedelta(seconds=100 * b)).strftime("%Y%m%dT%H%M%S.000Z")
        mode = RANKED_MODES[b % 2]
        a, o = rng.sample(range(n_players), 2)
        ta, to = tags[a], tags[o]
        da, do = rng.randrange(len(DECK_TEMPLATES)), rng.randrange(len(DECK_TEMPLATES))
        ca, co = rng.randint(0, 3), rng.randint(0, 3)
        if b % 10 == 0:
            co = ca  # draws
        battle = make_battle(
            ts, mode, ta, ca, make_deck(da, evo_first=(b % 7 == 0)), to, co, make_deck(do)
        )
        battles.append(battle)
        if b % 4 == 0:
            battles.append(json.loads(json.dumps(battle)))  # exact duplicate → deduped

    # Edge cases that must be dropped:
    battles.append(  # non-1v1
        {
            "battleTime": "20270101000000.000Z",
            "type": "2v2",
            "gameMode": {"id": 72000006, "name": "Ladder"},
            "team": [
                {"tag": "#P1", "crowns": 1, "cards": make_deck(0)},
                {"tag": "#P2", "crowns": 1, "cards": make_deck(1)},
            ],
            "opponent": [
                {"tag": "#P3", "crowns": 0, "cards": make_deck(2)},
                {"tag": "#P4", "crowns": 0, "cards": make_deck(3)},
            ],
        }
    )
    battles.append(  # non-whitelisted mode
        make_battle("20270101000001.000Z", 99999999, "#P1", 3, make_deck(0), "#P2", 0, make_deck(1))
    )
    battles.append(  # short deck → dropped
        make_battle("20270101000002.000Z", 72000006, "#P1", 1, make_deck(0)[:5], "#P2", 0, make_deck(1))
    )
    dup_deck = make_deck(0)
    dup_deck[1] = dict(dup_deck[0])  # duplicate (id, variant) pair → dropped
    battles.append(
        make_battle("20270101000003.000Z", 72000006, "#P1", 1, dup_deck, "#P2", 0, make_deck(1))
    )
    # missing card name → resolved from catalog
    noname = make_deck(2)
    noname[0] = {"id": noname[0]["id"], "name": "", "evolutionLevel": 0}
    noname[1] = {"id": noname[1]["id"], "name": None, "evolutionLevel": 0}
    battles.append(
        make_battle("20270101000004.000Z", 72000464, "#P1", 2, noname, "#NOTTOP", 1, make_deck(4))
    )
    # neither participant TopN (when top_n small)
    battles.append(
        make_battle("20270101000005.000Z", 72000006, "#OUT1", 0, make_deck(5), "#OUT2", 2, make_deck(6))
    )

    # Override: re-type the first template's deck
    ov_hash = py_deck_hash_from_cards(make_deck(0))
    overrides = [{"deck_hash": ov_hash, "deck_type": "OverriddenSiege"}]
    return leaderboard, battles, overrides


# ---------------------------------------------------------------------------
# Pure-Python oracle (reference semantics, independently re-derived)
# ---------------------------------------------------------------------------

def py_variant(lvl) -> str:
    try:
        lvl = int(lvl or 0)
    except Exception:
        lvl = 0
    return {1: "evo", 2: "hero"}.get(lvl, "normal")


# Mirror of the streaming path's battle-time parse
# (streaming/incremental.py: try_to_timestamp(battleTime,
# "yyyyMMdd'T'HHmmss.SSSX")) over the fixture's value space: the
# well-formed form is 8 digits, 'T', 6 digits, millis, zone. The
# generator's malformed edge-case times (no 'T') must NOT match —
# they're exactly the rows the streaming watermark column drops.
_BATTLE_TS_RE = re.compile(r"\d{8}T\d{6}\.\d{3}(?:Z|[+-]\d{2}(?::?\d{2})?)")


def py_battle_time_parses(bt) -> bool:
    return bool(bt) and _BATTLE_TS_RE.fullmatch(bt) is not None


def py_normalize_tag(tag) -> str:
    t = (tag or "").strip().upper()
    if t and not t.startswith("#"):
        t = "#" + t
    return t


def py_deck_hash_from_cards(cards: list[dict]) -> str:
    pairs = sorted(
        (str(int(c["id"])), py_variant(c.get("evolutionLevel"))) for c in cards[:8]
    )
    sig = "|".join(f"{c}:{v}" for c, v in pairs)
    return hashlib.sha1(sig.encode("utf-8")).hexdigest()


def py_match_hash(battle: dict) -> str:
    gm = battle.get("gameMode") or {}
    mode_key = str(gm.get("id") or gm.get("name") or battle.get("type") or "")

    def side(side_list):
        rows = [
            {"tag": (p.get("tag") or "").upper(), "crowns": int(p.get("crowns") or 0)}
            for p in (side_list or [])
        ]
        rows.sort(key=lambda r: r["tag"])
        return rows

    payload = {
        "battleTime": battle.get("battleTime") or "",
        "mode": mode_key,
        "team": side(battle.get("team")),
        "opponent": side(battle.get("opponent")),
    }
    return hashlib.sha1(
        json.dumps(payload, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()


def py_extract_8(participant: dict) -> list[tuple] | None:
    """(card_id, card_name, variant, slot) ×8 or None."""
    cards = participant.get("cards") or []
    if len(cards) < 8:
        return None
    out = []
    for slot, c in enumerate(cards[:8], start=1):
        cid = c.get("id")
        if cid is None:
            return None
        name = (c.get("name") or "").strip() or _BY_ID.get(int(cid), "")
        out.append((int(cid), name, py_variant(c.get("evolutionLevel")), slot))
    if len({(c, v) for c, _, v, _ in out}) != 8:
        return None
    return out


def py_classify(names: list[str]) -> str:
    if not names:
        return "Hybrid"
    metas = [_BY_NAME.get(n) for n in names]
    elixirs = [m[1] for m in metas if m is not None]
    if not elixirs:
        avg, four = 3.0, 12.0
    else:
        avg = sum(elixirs) / 8.0
        four = sum(sorted(elixirs)[:4])
    bait = sum(1 for m in metas if m and m[3])
    spam = sum(1 for m in metas if m and m[4])
    tank = sum(1 for m in metas if m and m[2])
    if "X-Bow" in names or "Mortar" in names:
        return "Siege"
    if bait >= 3:
        return "Bait"
    if four <= 9:
        return "Cycle"
    if spam >= 2:
        return "Bridge Spam"
    if tank >= 1 and avg >= 3.5:
        return "Beatdown"
    return "Hybrid"


def py_normalize_battles(battles: list[dict]) -> list[dict]:
    """B2 oracle (battle_filters.py:52-97): ranked-1v1 filter + projection
    to {battle_time, result, my_cards, opp_cards, mode_name}. Card lists
    keep only non-empty trimmed names; no catalog resolution, no 8-card
    cut on this path."""

    def names(side):
        out = []
        for c in (side[0].get("cards") or []):
            n = (c.get("name") or "").strip()
            if n:
                out.append(n)
        return out

    rows = []
    for b in battles:
        if not isinstance(b, dict):
            continue
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
        gm = b.get("gameMode") or {}
        mode_name = gm.get("name") or b.get("type") or ""
        rows.append(
            {
                "battle_time": b.get("battleTime"),
                "result": result,
                "my_cards": names(team),
                "opp_cards": names(opp),
                "mode_name": mode_name,
            }
        )
    return rows


def py_library_summary(normalized: list[dict]) -> list[dict]:
    """E8 oracle (deck_type.py:192-274): per-archetype
    {games, wins, losses, draws, win_rate} for both perspectives; a side
    is skipped when its (name-filtered) card list is not exactly 8."""
    acc: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for r in normalized:
        for side, cards_key, win_res, loss_res in (
            ("mine", "my_cards", "win", "loss"),
            ("opponent", "opp_cards", "loss", "win"),
        ):
            cards = r[cards_key]
            if len(cards) != 8:
                continue
            dt = py_classify(cards)
            a = acc[(side, dt)]
            a[0] += 1
            if r["result"] == win_res:
                a[1] += 1
            elif r["result"] == loss_res:
                a[2] += 1
            else:
                a[3] += 1
    return [
        {
            "side": side,
            "deck_type": dt,
            "games": g,
            "wins": w,
            "losses": l,
            "draws": d,
            "win_rate": (w / g) if g else 0.0,
        }
        for (side, dt), (g, w, l, d) in sorted(acc.items())
    ]


def oracle_etl(leaderboard, battles, overrides, top_n):
    """Accumulator ETL per the reference dataflow. Battles are processed in
    (battleTime, match_hash) order with team side before opponent — the
    same deterministic first-seen order the Spark pipeline uses."""
    ov = {r["deck_hash"]: r["deck_type"] for r in overrides}

    # Positional cut FIRST, then empty-tag skip — the reference slices
    # the raw API rows before validating tags (scripts:203-216).
    players = []
    for i, p in enumerate(leaderboard[:top_n], start=1):
        tag = py_normalize_tag(p.get("tag"))
        if not tag:
            continue
        try:
            ladder = int(p.get("trophies") or p.get("eloRating") or 0)
        except Exception:
            ladder = 0
        players.append(
            {
                "player_tag": tag,
                "player_name": (p.get("name") or "").strip(),
                "trophies": ladder,
                "rank_global": int(p.get("rank") or i),
            }
        )
    top_tags = {p["player_tag"] for p in players}

    def is_ranked(b):
        team, opp = b.get("team"), b.get("opponent")
        if not isinstance(team, list) or not isinstance(opp, list):
            return False
        if len(team) != 1 or len(opp) != 1:
            return False
        return (b.get("gameMode") or {}).get("id") in RANKED_MODES

    ranked = [b for b in battles if isinstance(b, dict) and is_ranked(b)]
    # dedup keeping deterministic first copy (same order as Spark window)
    by_hash: dict[str, dict] = {}
    for b in ranked:
        mh = py_match_hash(b)
        key = json.dumps({"team": b.get("team"), "opponent": b.get("opponent")})
        if mh not in by_hash or (b.get("battleTime") or "", key) < by_hash[mh][0]:
            by_hash[mh] = ((b.get("battleTime") or "", key), b)
    deduped = sorted(
        ((mh, b) for mh, (_, b) in by_hash.items()),
        key=lambda x: (x[1].get("battleTime") or "", x[0]),
    )

    cards_dim: dict[int, str] = {}
    deck_type_of: dict[str, str] = {}
    deck_cards_of: dict[str, list] = {}
    player_battles: list[dict] = []
    player_decks = defaultdict(lambda: [0, 0])
    meta_deck_types = defaultdict(lambda: [0, 0])
    meta_type_deck_ids = defaultdict(lambda: [0, 0])
    meta_type_cards = defaultdict(lambda: [0, 0])
    matchups = defaultdict(lambda: [0, 0])

    valid_battles = 0
    for mh, b in deduped:
        team_p, opp_p = b["team"][0], b["opponent"][0]
        team_tag, opp_tag = py_normalize_tag(team_p.get("tag")), py_normalize_tag(opp_p.get("tag"))
        if not team_tag or not opp_tag:
            continue
        tc = py_extract_8(team_p)
        oc = py_extract_8(opp_p)
        if tc is None or oc is None:
            continue
        valid_battles += 1
        tdh = py_deck_hash_from_cards(team_p["cards"])
        odh = py_deck_hash_from_cards(opp_p["cards"])
        tdt = ov.get(tdh) or py_classify([n for _, n, _, _ in tc if n])
        odt = ov.get(odh) or py_classify([n for _, n, _, _ in oc if n])
        tcr = int(team_p.get("crowns") or 0)
        ocr = int(opp_p.get("crowns") or 0)
        twon, owon = tcr > ocr, ocr > tcr

        matchups[(tdt, odt)][0] += 1
        matchups[(tdt, odt)][1] += 1 if twon else 0
        matchups[(odt, tdt)][0] += 1
        matchups[(odt, tdt)][1] += 1 if owon else 0

        for side, (tag, dh, dt, obs, won) in enumerate(
            (
                (team_tag, tdh, tdt, tc, twon),
                (opp_tag, odh, odt, oc, owon),
            )
        ):
            if dh not in deck_type_of:
                deck_type_of[dh] = dt
                deck_cards_of[dh] = obs
            for cid, name, *_ in obs:
                if name:
                    cards_dim[cid] = name
            meta_deck_types[dt][0] += 1
            meta_deck_types[dt][1] += 1 if won else 0
            meta_type_deck_ids[(dt, dh)][0] += 1
            meta_type_deck_ids[(dt, dh)][1] += 1 if won else 0
            for cid, _, var, _ in obs:
                meta_type_cards[(dt, cid, var)][0] += 1
                meta_type_cards[(dt, cid, var)][1] += 1 if won else 0
            if tag in top_tags:
                player_battles.append(
                    {
                        "match_hash": mh,
                        # None (not '') when absent — the Spark fact
                        # carries battleTime through unchanged, so a
                        # missing source value is NULL on both sides
                        "battle_time": b.get("battleTime"),
                        "side": side,
                        "player_tag": tag,
                        "deck_hash": dh,
                        "win": bool(won),
                    }
                )
                player_decks[(tag, dh)][0] += 1
                player_decks[(tag, dh)][1] += 1 if won else 0

    player_type_cards = defaultdict(lambda: [0, 0])
    for (ptag, dh), (uses, wins) in player_decks.items():
        dt = deck_type_of.get(dh, "Hybrid")
        for cid, _, var, _ in deck_cards_of.get(dh, []):
            player_type_cards[(ptag, dt, cid, var)][0] += uses
            player_type_cards[(ptag, dt, cid, var)][1] += wins

    return {
        "player": players,
        "deck_types": sorted(set(deck_type_of.values())),
        "cards": cards_dim,
        "decks": deck_type_of,
        "deck_cards": deck_cards_of,
        "player_battles": player_battles,
        "player_decks": dict(player_decks),
        "meta_deck_types": dict(meta_deck_types),
        "meta_type_deck_ids": dict(meta_type_deck_ids),
        "meta_type_cards": dict(meta_type_cards),
        "player_type_cards": dict(player_type_cards),
        "meta_type_matchups": dict(matchups),
        "deduped_matches": len(deduped),
        # E7 scan counters (scripts/etl_snapshot_topn.py:249,261 accounting)
        "counters": {
            "scanned_entries": len(battles),
            "ranked_1v1": len(ranked),
            "deduped_matches": len(deduped),
            "valid_battles": valid_battles,
            # what the STREAMING dedup twin must reproduce: matches whose
            # battleTime parses as the watermark event time (match_hash
            # embeds battleTime, so parseability is uniform per hash)
            "stream_deduped_matches": sum(
                1 for _, b in deduped if py_battle_time_parses(b.get("battleTime"))
            ),
        },
    }
