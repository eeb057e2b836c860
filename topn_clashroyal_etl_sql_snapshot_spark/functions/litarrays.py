"""Fast literal-array construction for model-as-plan-literal operators.

Every model-shipping operator in this engine (PQ codebooks, IVF
centroid matrices, classifier weight maps, char-LM tables, DSIR
weights, simhash bit masks) embeds its model as an ``array(...)``
literal. The idiomatic ``F.array(*[F.lit(v) for v in vals])`` costs one
py4j round trip PER ELEMENT — measured 0.4 s per 1,024-element array,
and the PQ search built five of them per query (~2.5 s of the
embedding_pq_topk entry was literal construction, r17 profile). These
helpers build the SAME array<...> literal from ONE parsed SQL
expression (~3 ms warm), bit-identical by construction (decimal
``repr`` round-trips doubles exactly; parity pinned in
tests/test_exprs.py).

A parsed ``array(...)`` call of foldable children constant-folds to a
single Literal during optimization — exactly what the per-element form
folded to — so the runtime plan is unchanged; only driver-side
construction and analysis get cheaper (one node vs thousands).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_doubles(vals) -> Column:
    """array<double> literal in ONE call. numpy-backed ``F.lit`` builds
    a TRUE (pre-folded) Literal node — the analyzer sees one node per
    REFERENCE, which matters in kernels that embed the same model array
    in K compiled columns (measured: a 16-sum aggregation over a
    1,024-element array cost 2.1 s to analyze as a parsed array(...)
    call vs 0.29 s as a folded Literal). Handles nan/inf natively
    (no SQL literal spelling needed)."""
    import numpy as np

    return F.lit(np.asarray(list(vals), dtype=np.float64))


def lit_longs(vals) -> Column:
    """array<bigint> literal in ONE call (folded Literal, see
    :func:`lit_doubles`)."""
    import numpy as np

    return F.lit(np.asarray([int(v) for v in vals], dtype=np.int64))


def _sql_str(s: str) -> str:
    # Spark's default parser treats backslash as an escape inside
    # string literals (escapedStringLiterals=false): escape the escape
    # char and the quote; everything else (newlines, unicode) passes
    # through the literal verbatim.
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def lit_strings(vals) -> Column:
    """array<string> literal from ONE parsed expression (backslash/quote
    escaped; parity with the per-element form pinned in tests)."""
    vals = list(vals)
    if not vals:
        return F.array().cast("array<string>")
    if any(v is None for v in vals):
        return F.array(*[F.lit(v) for v in vals]).cast("array<string>")
    return F.expr("array(" + ",".join(_sql_str(v) for v in vals) + ")")
