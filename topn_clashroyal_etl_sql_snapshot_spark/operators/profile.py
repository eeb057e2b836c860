"""Corpus profiling: the one-pass telemetry report a pipeline logs
before and after every curation stage (docs, size, language mix,
quality distribution, duplication, mojibake) — the numbers that decide
whether a 100 TB run proceeds.

No reference analog; training-pipeline extension surface. The point of
the operator is the PLAN SHAPE: every statistic is an aggregate over
one corpus scan — counts, sums, exact percentiles, distinct
fingerprints, conditional counts — composed into a single
``groupBy().agg(...)`` so profiling N statistics costs one shuffle,
not N jobs (the naive loop of ``df.select(stat).collect()`` per metric
re-scans the corpus per statistic).

Notes on the aggregate choices:

- ``percentile`` (exact) rather than ``percentile_approx``: exact is
  deterministic and oracle-able; at true corpus scale swap in
  ``percentile_approx`` and accept the sketch bound — the column list
  is the only change.
- the dup rate uses ``countDistinct`` of the normalized content
  fingerprint — one extra Expand pass, the same cost shape as
  ``dedup_exact_summary``.
- language mix is reported as ``pct_und`` (the gate's reject rate)
  here; the full per-language breakdown is the grouped variant
  (``corpus_profile(docs, by="lang")``) or ``textstats.token_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cleaning as cl
from ..functions import text as tx


def corpus_profile(
    docs: DataFrame,
    by: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """One row (or one per ``by`` group): doc/char/token counts, exact
    length percentiles, quality mean + p10/p50/p90, language-gate
    reject rate, exact-dup rate, and the mojibake rate. One scan, one
    shuffle."""
    t = F.col(text_col)
    q = tx.quality_score(t)
    n_chars = F.length(t)
    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.coalesce(n_chars, F.lit(0))).alias("total_chars"),
        F.sum(tx.token_count(t)).alias("total_tokens"),
        F.expr(f"percentile(length({text_col}), array(0.1, 0.5, 0.9))").alias(
            "chars_p10_p50_p90"
        ),
        F.avg(q).alias("quality_mean"),
        F.expr(
            "percentile(q, array(0.1, 0.5, 0.9))"
        ).alias("quality_p10_p50_p90"),
        F.count_if(tx.lang_id(t) == "und").alias("und_docs"),
        F.countDistinct(tx.content_fingerprint(t)).alias("unique_docs"),
        F.avg(cl.replacement_char_ratio(t)).alias("replacement_char_rate"),
    ]
    base = docs.withColumn("q", q)
    grouped = base.groupBy(by) if by else base.groupBy()
    prof = grouped.agg(*aggs).withColumns(
        {
            "pct_und": F.col("und_docs").cast("double") / F.col("docs"),
            "dup_rate": (F.col("docs") - F.col("unique_docs")).cast("double")
            / F.col("docs"),
            "avg_chars": F.col("total_chars").cast("double") / F.col("docs"),
        }
    )
    return prof.orderBy(by) if by else prof
