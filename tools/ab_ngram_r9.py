#!/usr/bin/env python
"""Same-session A/B: FUSED ngram_repetition_stats (r8, current
textstats.py) vs the r7 PER-N form — the adjudication the r8 verdict
demanded (driver bench read 6.44 s m3 and an independent judge rerun
6.17 s vs 4.13 s pre-fusion; SCALE.md's 3.66 s closing claim did not
reproduce).

Protocol (the ab_pq_fit_r8.py playbook): ONE session, warm codegen for
BOTH variants first, then interleave A/B/A/B/A/B so machine drift hits
both arms equally; median-of-3 per arm; results asserted bit-identical
(sorted collect compare of all 10 columns + token_chars) before any
timing is believed. Per-arm load telemetry (getloadavg + /proc/stat
busy-fraction) recorded so a drifted arm self-identifies.

Run: python tools/ab_ngram_r9.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from topn_clashroyal_etl_sql_snapshot_spark.testing.telemetry import (
    cpu_busy as _cpu_busy,
)

from pyspark.sql import DataFrame, functions as F  # noqa: E402




def ngram_repetition_stats_per_n(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """The r7 per-n form, verbatim (git eba2279): Σ|ns| = 9 separate
    explode→groupBy passes, one left join per n."""
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

    def grams_of(n: int) -> DataFrame:
        idx = F.when(
            F.size("toks") >= n,
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        return toks.select(
            "id",
            F.posexplode(
                F.transform(
                    idx,
                    lambda i: F.array_join(F.slice(F.col("toks"), i, n), " "),
                )
            ).alias("pos", "gram"),
        )

    out = docs.select(F.col(id_col).alias("id"))
    safe_div = lambda a, b: F.when(  # noqa: E731
        b > 0, a.cast("double") / b
    ).otherwise(F.lit(0.0))

    stats_cols: list = []
    for n in top_ns:
        grams = grams_of(n)
        top = (
            grams.groupBy("id", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("id")
            .agg(
                F.max_by(
                    F.col("cnt") * (F.length("gram") - (n - 1)),
                    F.struct(F.col("cnt"), F.col("gram")),
                ).alias(f"_top{n}")
            )
        )
        out = out.join(top, "id", "left")
        stats_cols.append(
            F.least(
                F.lit(1.0),
                safe_div(
                    F.coalesce(F.col(f"_top{n}"), F.lit(0)),
                    F.coalesce(F.col("_token_chars"), F.lit(0)),
                ),
            ).alias(f"top_{n}gram_char_frac")
        )

    for n in dup_ns:
        grams = grams_of(n)
        dup_keys = (
            grams.groupBy("id", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
            .select("id", "gram")
        )
        covered = (
            grams.join(dup_keys, ["id", "gram"])
            .select(
                "id",
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + (n - 1))
                ).alias("p"),
            )
            .distinct()
            .join(tokstream, ["id", "p"])
            .groupBy("id")
            .agg(F.sum("len").alias(f"_dup{n}"))
        )
        out = out.join(covered, "id", "left")
        stats_cols.append(
            safe_div(
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from topn_clashroyal_etl_sql_snapshot_spark.operators import textstats
    from topn_clashroyal_etl_sql_snapshot_spark.operators.dedup import (
        token_arrays,
    )
    from topn_clashroyal_etl_sql_snapshot_spark.session import get_spark

    spark = get_spark(app_name="ab_ngram_r9")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # Replicate the bench entry's shape: session-cached token arrays
    # shared with the dedup family, final orderBy, full collect.
    toks = token_arrays(docs).persist()
    toks.count()

    def fused():
        return textstats.ngram_repetition_stats(docs, toks=toks).orderBy(
            "doc_id"
        )

    def per_n():
        return ngram_repetition_stats_per_n(docs, toks=toks).orderBy(
            "doc_id"
        )

    # Correctness gate before any timing: identical rows, all columns.
    a = fused().collect()
    b = per_n().collect()
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        da, db = ra.asDict(), rb.asDict()
        assert set(da) == set(db), (set(da) ^ set(db))
        for k in da:
            va, vb = da[k], db[k]
            if isinstance(va, float):
                assert abs(va - vb) < 1e-12, (ra["doc_id"], k, va, vb)
            else:
                assert va == vb, (ra["doc_id"], k, va, vb)
    print(f"IDENTICAL: {len(a)} rows x {len(a[0].asDict())} cols", flush=True)

    import gc

    arms = {"fused": fused, "per_n": per_n}
    samples: dict[str, list[float]] = {k: [] for k in arms}
    loads: dict[str, list[dict]] = {k: [] for k in arms}
    for _ in range(3):  # interleaved: drift hits both arms equally
        for name, mk in arms.items():
            gc.collect()
            l0 = os.getloadavg()[0]
            b0, t0j = _cpu_busy()
            t0 = time.perf_counter()
            mk().collect()
            dt = time.perf_counter() - t0
            b1, t1j = _cpu_busy()
            samples[name].append(dt)
            loads[name].append(
                {
                    "load1": round(l0, 2),
                    "cpu_busy": round((b1 - b0) / max(t1j - t0j, 1e-9), 3),
                }
            )

    for name in arms:
        med = statistics.median(samples[name])
        print(
            f"{name}: m3={med:.3f}s samples="
            f"{[round(s, 3) for s in samples[name]]} load={loads[name]}",
            flush=True,
        )
    f_m, p_m = (statistics.median(samples[k]) for k in ("fused", "per_n"))
    print(
        f"VERDICT: {'FUSED' if f_m <= p_m else 'PER_N'} wins "
        f"({f_m:.3f} vs {p_m:.3f}, ratio {f_m / p_m:.2f})",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
