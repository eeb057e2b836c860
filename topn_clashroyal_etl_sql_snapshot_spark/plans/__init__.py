from . import pipeline, queries, validate

__all__ = ["pipeline", "queries", "validate"]
