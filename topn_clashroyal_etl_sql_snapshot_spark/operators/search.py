"""Corpus search: inverted term index + BM25 ranking as pure relational
algebra — query-driven data selection over the ``documents`` table.

No reference analog; training-pipeline extension surface. Curation
pipelines need lexical retrieval constantly: pulling benchmark-relevant
documents for targeted decontamination review, selecting in-domain
subsets by keyword recipe, or auditing what a filter kept ("show me the
top matches for X"). BM25 (Robertson-Spärck Jones probabilistic
relevance; the Okapi BM25 formula as published in Robertson & Zaragoza
2009, "The Probabilistic Relevance Framework: BM25 and Beyond") is the
standard lexical ranker, and it is pure count algebra — exactly what a
Spark plan is good at.

Scale shape (the reason this beats shipping the corpus to an external
search engine for pipeline-internal selection):

- **Index** (:func:`term_postings`): one tokenize scan (shared with the
  dedup/classifier families via ``toks``) → explode → one (id, term)
  groupBy. At 100 TB this is the same inverted-index discipline as
  ``dedup.jaccard_pairs`` — postings shuffle on high-cardinality term
  keys, no skew surface beyond natural term hotness (stopword-heavy
  corpora should pre-filter terms the same way the dedup family df-caps
  shingles).
- **Query** (:func:`bm25_topk`): the query's term set is a handful of
  strings — it rides into the plan as a BROADCAST literal table, so
  scoring is a map-side semi-join of postings against the query terms,
  one tiny df aggregation (≤ |query| rows), and ONE doc-keyed sum.
  Corpus statistics (N, avgdl) come from a 1-row aggregate crossed in
  via a broadcast nested-loop join of a single row — no driver-side
  ``collect()`` anywhere, so the whole ranker stays a lazy DataFrame
  composable into larger plans.
- **Top-k**: global ``orderBy(...).limit(k)`` — Spark plans it as
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
  the right 1000-executor shape.

Determinism (module-wide house contract): per-(doc, term) BM25
contributions are quantized to micro units (``round(x·1e6)`` as long)
before the doc-keyed sum, so scores are exact integers — partition-order
independent and reproducible bit-for-bit by the driver row's DuckDB
oracle (same device as operators/lm_score.py's micro-nat sums). The
doubles being quantized are single expressions over exact integer
inputs (tf, df, dl, N), so both engines compute identical IEEE values;
ties in the top-k cut break on ``doc_id``.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _normalize_query(query: str) -> list[str]:
    """Python twin of ``functions/text.py::tokens`` for the query
    string: same character class, same lowercasing, empties dropped,
    deduplicated (BM25 over distinct query terms) in first-seen order
    so generated plans and oracles are stable."""
    from ..functions.text import py_tokens

    words = py_tokens(query)
    seen: dict[str, None] = {}
    for w in words:
        seen.setdefault(w, None)
    return list(seen)


def term_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id, term, tf) — the corpus inverted index at term-frequency
    grain. One explode + one groupBy; pass ``toks`` (a
    ``dedup.token_arrays`` result) to share the tokenize scan with the
    dedup/classifier/search families."""
    from . import dedup

    if toks is None:
        toks = dedup.token_arrays(docs, text_col, id_col)
    return (
        toks.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_terms, score_micro, score): top-``k`` documents for
    ``query`` under Okapi BM25 with parameters ``k1``/``b``.

    ``idf = ln(1 + (N - df + ½)/(df + ½))`` (the +1 form — never
    negative for df > N/2 terms), ``tf_norm = tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl))``; a document's score is the sum of
    micro-quantized ``idf·tf_norm`` over the query terms it contains.
    ``N`` counts every corpus document and ``avgdl`` averages token
    counts with empty/NULL documents as 0 — both from one 1-row
    aggregate broadcast-crossed into the scoring join. ``n_terms`` is
    how many distinct query terms matched. Ties break on ascending
    ``doc_id``; rows arrive sorted (score desc, doc_id asc).

    Pass ``postings`` (a :func:`term_postings` result, possibly
    persisted) to amortize the index across many queries — the
    per-query cost is then just the broadcast semi-join + one sum."""
    from . import dedup

    spark = docs.sparkSession
    terms = _normalize_query(query)
    if not terms:
        raise ValueError("query has no tokens after normalization")
    if toks is None:
        toks = dedup.token_arrays(docs, text_col, id_col)
    if postings is None:
        postings = term_postings(docs, text_col, id_col, toks=toks)

    qterms = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string")
    )
    # corpus stats: one row, crossed in via broadcast — stays lazy
    dl = toks.select("id", F.coalesce(F.size("toks"), F.lit(0)).alias("dl"))
    stats = F.broadcast(
        docs.select(F.col(id_col).alias("id"))
        .join(dl, "id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.coalesce(F.col("dl"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("avgdl"),
        )
    )
    matched = postings.join(qterms, "term")
    df_tab = F.broadcast(
        matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        matched.join(df_tab, "term")
        .join(dl, "id")
        .crossJoin(stats)
        .select(
            "id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (
                        F.col("n_docs").cast("double")
                        - F.col("df")
                        + F.lit(0.5)
                    )
                    / (F.col("df") + F.lit(0.5))
                )
                * (
                    F.col("tf") * F.lit(k1 + 1.0)
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")
                        )
                    )
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("c_micro"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c_micro").alias("score_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_terms",
            "score_micro",
            (F.col("score_micro").cast("double") / F.lit(1e6)).alias("score"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(k)
    )
