from .schemas import (
    BATTLE_SCHEMA,
    CARD_METADATA_SCHEMA,
    LEADERBOARD_SCHEMA,
    OVERRIDES_SCHEMA,
    WAREHOUSE_SCHEMAS,
)
from .readers import (
    read_battles_json,
    read_card_catalog,
    read_leaderboard_json,
    read_overrides,
    read_table,
    read_testdata,
    register_testdata_views,
)

__all__ = [
    "BATTLE_SCHEMA",
    "CARD_METADATA_SCHEMA",
    "LEADERBOARD_SCHEMA",
    "OVERRIDES_SCHEMA",
    "WAREHOUSE_SCHEMAS",
    "read_battles_json",
    "read_card_catalog",
    "read_leaderboard_json",
    "read_overrides",
    "read_table",
    "read_testdata",
    "register_testdata_views",
]
