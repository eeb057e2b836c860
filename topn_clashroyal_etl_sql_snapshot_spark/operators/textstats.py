"""Relational (explode + codegen aggregate) forms of the text analytics.

The column expressions in ``functions/text.py`` are the right shape for
composition, but marker counting via per-row ``F.filter`` lambdas runs
interpreted (see SCALE.md on the HOF hazard). These table-level forms do
one explode and compiled conditional SUMs — the 100 TB shape.

Semantics are identical to the expression forms (same tokenizer, same
marker sets, same tie-break order) — asserted in tests/test_text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def lang_id_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col..., predicted_lang) for every input row.

    Plan: one rlike per doc for the CJK gate; explode tokens → 4
    conditional SUMs per doc (partial+final, codegen) → broadcast-size
    join back; argmax with LANG_ORDER tie-break, 'und' when no markers.
    """
    base = docs.withColumn("_cjk", F.col(text_col).rlike("[\\u4e00-\\u9fff]"))

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tx.tokens(F.col(text_col))).alias("tok"),
    )
    counts = toks.groupBy("_id").agg(
        *[
            F.sum(F.col("tok").isin(*markers).cast("long")).alias(f"_c_{lang}")
            for lang, markers in tx.LANG_MARKERS.items()
        ]
    )

    joined = base.join(counts, base[id_col] == counts["_id"], "left").drop("_id")
    cnt = {
        lang: F.coalesce(F.col(f"_c_{lang}"), F.lit(0)) for lang in tx.LANG_MARKERS
    }
    best = F.greatest(*cnt.values())
    pred = F.when(F.col("_cjk"), F.lit("zh")).when(best <= 0, F.lit("und"))
    for lang in tx.LANG_ORDER:
        pred = pred.when(cnt[lang] == best, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))

    return joined.withColumn("predicted_lang", pred).drop(
        "_cjk", *[f"_c_{lang}" for lang in tx.LANG_MARKERS]
    )


def token_stats(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group doc/token/char accounting (single pass, integer sums)."""
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(tx.token_count(F.col(text_col))).alias("total_tokens"),
            F.sum(F.length(text_col)).alias("total_chars"),
        )
        .orderBy(group_col)
    )
