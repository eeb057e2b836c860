from . import (
    asof,
    compression,
    deck,
    dedup,
    jpeg,
    multimodal,
    packing,
    sampling,
    sessionize,
    similarity,
    skew,
    textstats,
)

__all__ = [
    "asof",
    "compression",
    "deck",
    "dedup",
    "jpeg",
    "multimodal",
    "packing",
    "sampling",
    "sessionize",
    "similarity",
    "skew",
    "textstats",
]
