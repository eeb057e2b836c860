from . import pipeline, queries, validate
from . import testdata_queries
from . import llm_queries  # noqa: F401 — registers its queries on import
from . import domain_queries  # noqa: F401 — registers cr_* pipeline queries

__all__ = [
    "pipeline",
    "queries",
    "validate",
    "testdata_queries",
    "llm_queries",
    "domain_queries",
]
