"""Vector math over ``array<float>`` embedding columns as column algebra.

Dot products fold left in array-index order (``F.aggregate``), with every
element cast to double first — bit-deterministic regardless of partition
layout, and mirrorable in DuckDB (``list_sum(list_transform(...))`` folds
the same way) so similarity queries can be oracle-checked exactly.

For the hot path at scale these stay JVM-side; a Pandas-UDF/numpy variant
is deliberately NOT the default — per-pair loops dominate ANN cost and
the fold is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_prenormed(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot and per-side norms — use when norms
    are materialized once per vector instead of once per pair."""
    return dot_col / F.nullif(norm_a * norm_b, F.lit(0.0))
