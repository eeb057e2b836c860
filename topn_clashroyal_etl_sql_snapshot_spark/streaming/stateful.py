"""Custom stateful streaming operator, in BOTH stateful-processing
APIs: a continuously-updated per-player running record (uses/wins),
i.e. the streaming form of the ``player_decks`` accumulator the
reference rebuilds from scratch every refresh
(scripts/etl_snapshot_topn.py:332-335).

This is the designated escape hatch for operators Structured
Streaming's built-ins can't express (running state that must survive
across windows without re-aggregating history). State is per
player_tag. :func:`running_player_stats` is the
``applyInPandasWithState`` form (runs on any state store);
:func:`running_player_stats_tws` is the Spark 4
``transformWithStateInPandas`` successor (named ValueState,
store-managed TTL, timer support; needs RocksDB + google.protobuf —
see README known limits), emitted-row-identical by test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STATE_SCHEMA = "uses LONG, wins LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("player_tag", T.StringType(), False),
        T.StructField("uses", T.LongType(), False),
        T.StructField("wins", T.LongType(), False),
    ]
)


def _fold_totals(uses: int, wins: int, batches) -> tuple[int, int]:
    """THE accumulation rule, shared by both stateful APIs (r11 review:
    it existed twice, and the cross-API parity test is container-gated
    on protobuf — a drift could ship unseen)."""
    for pdf in batches:
        uses += len(pdf)
        wins += int(pdf["won"].sum())
    return uses, wins


def _prepared(participants: DataFrame):
    """Shared select/groupBy preamble of both stateful entry points."""
    return participants.select(
        "player_tag", F.col("won").cast("int").alias("won")
    ).groupBy("player_tag")


def _update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    uses, wins = state.get if state.exists else (0, 0)
    uses, wins = _fold_totals(uses, wins, batches)
    state.update((uses, wins))
    yield pd.DataFrame({"player_tag": [key[0]], "uses": [uses], "wins": [wins]})


def running_player_stats(participants: DataFrame) -> DataFrame:
    """participants stream (player_tag, won) → running (uses, wins) per
    player, emitted each micro-batch with the updated totals."""
    return (
        _prepared(participants)
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningStatsProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor`` form of :func:`_update`: the same
    running (uses, wins) totals held in a named ``ValueState``, with
    the store-managed TTL replacing the manual timeout plumbing the
    old API required."""

    def __init__(self, state_ttl_ms: int | None = None):
        self._ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", STATE_SCHEMA, self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        uses, wins = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0)
        )
        uses, wins = _fold_totals(uses, wins, rows)
        self._totals.update((uses, wins))
        yield pd.DataFrame(
            {"player_tag": [key[0]], "uses": [uses], "wins": [wins]}
        )

    def close(self) -> None:
        pass


def running_player_stats_tws(
    participants: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """:func:`running_player_stats` on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: named state variables (value/list/map)
    instead of one state tuple, store-managed per-state TTL instead of
    hand-rolled GroupState timeouts, and timer support for operators
    that need scheduled emission. Output rows are identical to the old
    API's (test-pinned on the same landing stream). Requires the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...RocksDBStateStoreProvider``) — Structured Streaming's default
    HDFS-backed store does not support transformWithState; on a real
    cluster RocksDB is what you run for any large keyed state anyway
    (keys spill to local SSD instead of executor heap)."""
    # TTL requires ProcessingTime time mode — with timeMode="None"
    # Spark raises STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL
    # at query start, so the advertised knob was dead on arrival (r11
    # review finding; the e2e test is protobuf-gated and only ran
    # TTL-less where it runs at all)
    time_mode = "ProcessingTime" if state_ttl_ms is not None else "None"
    return (
        _prepared(participants)
        .transformWithStateInPandas(
            statefulProcessor=_RunningStatsProcessor(state_ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode=time_mode,
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
