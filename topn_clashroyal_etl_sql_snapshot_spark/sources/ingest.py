"""Driver-side ingest: REST API → JSONL landing zone (A1-A3).

The reference fetches the leaderboard then battlelogs sequentially — the
N+1 HTTP pattern is its dominant latency (scripts/etl_snapshot_topn.py:
243-245; src/api/cr_client.py:24-46; src/api/battles.py:20-44). Ingest
is not a Spark operator: this module runs on the driver (or any plain
Python box), parallelizes the N battlelog fetches with a thread pool,
and writes one JSONL file per player — which is exactly the landing
layout ``readers.read_battles_json`` scans in parallel.

Network access and the ``requests`` dependency are optional: everything
is injectable (``fetch_fn``) so tests and offline environments exercise
the landing-zone logic without sockets.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable
from concurrent.futures import ThreadPoolExecutor

BASE_URL = "https://api.clashroyale.com/v1"


def _default_fetch(path: str, token: str, timeout: float = 10.0):
    """GET {BASE_URL}{path} with bearer auth (cr_client.py:24-46 shape).
    Imported lazily; raises if ``requests`` is unavailable."""
    import requests  # gated: not needed for any offline path

    resp = requests.get(
        f"{BASE_URL}{path}",
        headers={"Authorization": f"Bearer {token}"},
        timeout=timeout,
    )
    resp.raise_for_status()
    return resp.json()


def _unwrap_items(payload):
    """API responses are either a bare list or ``{"items": [...]}``
    (players.py:6-23; battles.py:27-40)."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict) and isinstance(payload.get("items"), list):
        return payload["items"]
    return []


def normalize_tag_str(tag: str | None) -> str:
    """Python-side twin of functions.exprs.normalize_tag (for URL paths)."""
    t = (tag or "").strip().upper()
    if t and not t.startswith("#"):
        t = "#" + t
    return t


def fetch_leaderboard(
    out_dir: str,
    limit: int = 1000,
    token: str = "",
    fetch_fn: Callable | None = None,
) -> str:
    """A1: leaderboard → ``{out_dir}/leaderboard.jsonl``."""
    fetch = fetch_fn or (lambda p: _default_fetch(p, token))
    players = _unwrap_items(
        fetch(f"/locations/global/pathoflegend/players?limit={limit}")
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "leaderboard.jsonl")
    with open(path, "w") as f:
        for p in players:
            f.write(json.dumps(p, sort_keys=True) + "\n")
    return path


def fetch_battlelogs(
    tags: Iterable[str],
    out_dir: str,
    token: str = "",
    fetch_fn: Callable | None = None,
    max_workers: int = 16,
) -> list[str]:
    """A2, parallelized: one battlelog JSONL per player under
    ``{out_dir}/battles/``. The reference's sequential loop becomes a
    thread pool (I/O bound; the 10 s/request timeout dominates)."""
    fetch = fetch_fn or (lambda p: _default_fetch(p, token))
    battles_dir = os.path.join(out_dir, "battles")
    os.makedirs(battles_dir, exist_ok=True)

    def one(tag: str) -> str:
        norm = normalize_tag_str(tag)
        encoded = norm.replace("#", "%23")
        battles = _unwrap_items(fetch(f"/players/{encoded}/battlelog"))
        path = os.path.join(battles_dir, f"{norm.lstrip('#')}.jsonl")
        with open(path, "w") as f:
            for b in battles:
                f.write(json.dumps(b, sort_keys=True) + "\n")
        return path

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(one, tags))
