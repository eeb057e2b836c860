#!/usr/bin/env python
"""r17 A/B (r16 verdict #6): 3-way-grouped n-gram repetition passes vs
the shipped per-n form.

The r9 A/B (tools/ab_ngram_r9.py) tested only the extremes — 9 per-n
passes vs ONE fused (id, n, gram) aggregation — and the fused end lost
1.36x (wider shuffle rows + lost per-n partial-agg locality). This
probes the middle ground the r16 verdict asked for: top_ns (2,3,4) in
one pass, dup_ns split (5,6,7) / (8,9,10) — 3 grouped passes instead
of 9, with n riding the gram stream as a SMALL int key and each
group's 3 per-n outputs pivoted out of one aggregation.

Protocol: assert bit-identical output vs ngram_repetition_stats at
sf0.01 first, then interleaved alternating-order A/B at sf0.1
(both variants sample the same box minutes apart — the r16 lesson).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (  # noqa: E402
    _safe_div,
    ngram_repetition_stats,
)


def ngram_repetition_stats_grouped(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_groups: tuple[tuple[int, ...], ...] = ((5, 6, 7), (8, 9, 10)),
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    from topn_clashroyal_etl_sql_snapshot_spark.operators.dedup import (
        token_arrays,
    )

    if toks is None:
        toks = token_arrays(docs, text_col, id_col)
    toks = toks.select(F.col("id"), F.col("toks"))

    tokstream = toks.select(
        "id", F.posexplode("toks").alias("p", "tok")
    ).select("id", "p", F.length("tok").alias("len"))
    totals = tokstream.groupBy("id").agg(F.sum("len").alias("_token_chars"))

    def grams_of_group(ns: tuple[int, ...]) -> DataFrame:
        # one exploded (id, n, pos, gram) stream for the whole group.
        # NB: the per-n lambda must be built by a factory with a SINGLE
        # parameter — a `lambda i, _n=n` default would be read by
        # F.transform as the two-arg (element, index) form.
        def gram_struct(n: int):
            return lambda i: F.struct(
                F.lit(n).alias("n"),
                (i - 1).alias("pos"),
                F.array_join(F.slice(F.col("toks"), i, n), " ").alias("gram"),
            )

        per_n = [
            F.transform(
                F.when(
                    F.size("toks") >= n,
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                ).otherwise(F.array().cast("array<int>")),
                gram_struct(n),
            )
            for n in ns
        ]
        return toks.select(
            "id", F.explode(F.flatten(F.array(*per_n))).alias("g")
        ).select("id", "g.n", "g.pos", "g.gram")

    out = docs.select(F.col(id_col).alias("id"))
    stats_cols: list = []

    # --- top_ns: one grouped pass -------------------------------------
    grams = grams_of_group(top_ns)
    top = (
        grams.groupBy("id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id", "n")
        .agg(
            F.max_by(
                F.col("cnt") * (F.length("gram") - (F.col("n") - 1)),
                F.struct(F.col("cnt"), F.col("gram")),
            ).alias("_top")
        )
        .groupBy("id")
        .agg(
            *[
                F.sum(F.when(F.col("n") == n, F.col("_top"))).alias(
                    f"_top{n}"
                )
                for n in top_ns
            ]
        )
    )
    out = out.join(top, "id", "left")
    for n in top_ns:
        stats_cols.append(
            F.least(
                F.lit(1.0),
                _safe_div(
                    F.coalesce(F.col(f"_top{n}"), F.lit(0)),
                    F.coalesce(F.col("_token_chars"), F.lit(0)),
                ),
            ).alias(f"top_{n}gram_char_frac")
        )

    # --- dup groups ----------------------------------------------------
    for ns in dup_groups:
        grams = grams_of_group(ns)
        dup_keys = (
            grams.groupBy("id", "n", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
            .select("id", "n", "gram")
        )
        covered = (
            grams.join(dup_keys, ["id", "n", "gram"])
            .select(
                "id",
                "n",
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
                ).alias("p"),
            )
            .distinct()
            .join(tokstream, ["id", "p"])
            .groupBy("id")
            .agg(
                *[
                    F.sum(F.when(F.col("n") == n, F.col("len"))).alias(
                        f"_dup{n}"
                    )
                    for n in ns
                ]
            )
        )
        out = out.join(covered, "id", "left")
        for n in ns:
            stats_cols.append(
                _safe_div(
                    F.coalesce(F.col(f"_dup{n}"), F.lit(0)),
                    F.coalesce(F.col("_token_chars"), F.lit(0)),
                ).alias(f"dup_{n}gram_char_frac")
            )

    return out.join(totals, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("_token_chars"), F.lit(0)).alias("token_chars"),
        *stats_cols,
    )


def main() -> None:
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark
    from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import (
        read_testdata,
    )

    spark = get_spark(app_name="ab_ngram3_r17")

    # 1. bit-identical check at sf0.01
    docs = read_testdata(spark, "/root/testdata/sf0.01", "documents")
    a = {
        r["doc_id"]: tuple(r)
        for r in ngram_repetition_stats(docs).collect()
    }
    b = {
        r["doc_id"]: tuple(r)
        for r in ngram_repetition_stats_grouped(docs).collect()
    }
    assert a == b, "grouped form differs at sf0.01"
    # column order/name parity too
    assert (
        ngram_repetition_stats(docs).columns
        == ngram_repetition_stats_grouped(docs).columns
    )
    print("sf0.01 bit-identical: OK", flush=True)

    # 2. interleaved alternating A/B at sf0.1
    docs = read_testdata(spark, "/root/testdata/sf0.1", "documents")
    ngram_repetition_stats(docs).orderBy("doc_id").collect()  # warm
    ngram_repetition_stats_grouped(docs).orderBy("doc_id").collect()

    per_n, grouped = [], []
    for r in range(8):
        order = (
            [("per_n", per_n), ("grouped", grouped)]
            if r % 2 == 0
            else [("grouped", grouped), ("per_n", per_n)]
        )
        for name, acc in order:
            fn = (
                ngram_repetition_stats
                if name == "per_n"
                else ngram_repetition_stats_grouped
            )
            t0 = time.perf_counter()
            fn(docs).orderBy("doc_id").collect()
            acc.append(time.perf_counter() - t0)
    import statistics

    print("per_n  ", [round(x, 3) for x in per_n])
    print("grouped", [round(x, 3) for x in grouped])
    print(
        "medians: per_n",
        round(statistics.median(per_n), 3),
        "grouped",
        round(statistics.median(grouped), 3),
    )
    spark.stop()


if __name__ == "__main__":
    main()
