from . import pipeline, queries, validate
from . import testdata_queries
from . import llm_queries  # noqa: F401 — registers its queries on import

__all__ = ["pipeline", "queries", "validate", "testdata_queries", "llm_queries"]
