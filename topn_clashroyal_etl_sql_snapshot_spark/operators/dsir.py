"""Domain-targeted data selection via importance resampling (DSIR).

Public recipe: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" (DSIR). Fit unigram bag-of-ngrams distributions
over a TARGET sample (the domain to up-select: wiki-quality text, a
downstream task's inputs) and the RAW corpus; every raw document scores
the log-likelihood ratio of its n-grams under the two models; select by
Gumbel top-k (= sampling without replacement with probability ∝ the
importance weight). Reference repo has no analog (its corpus is API
battle logs, scripts/etl_snapshot_topn.py ingests everything) — this is
the corpus-composition stage of the training-pipeline extension
mandate, sitting between quality gating and mixture sampling in the
curation funnel.

Two model kinds, same scoring algebra:

- **hashed** (:func:`fit_hashed_importance`) — the DSIR paper's form:
  unigram+bigram terms hash into a FIXED bucket space (the shared
  ``classifier.hashed_features`` pass), so fit state, broadcast size,
  and the per-epoch collect are bounded by ``n_buckets`` (~2·n_buckets
  longs), never by vocabulary or corpus size. The scale path.
- **term** (:func:`fit_term_importance`) — raw term strings as keys, no
  collision surface, fit driver-side from seed text lists (the target
  sample is small by construction in DSIR — a few thousand exemplar
  docs). Every scoring step is an exact integer join+sum on the term
  STRING, so a SQL oracle can reproduce it bit-for-bit (the hashed
  kind cannot be oracled: Spark's xxhash64-of-string has no SQL twin —
  same adjudication as the hashed classifier).

Determinism (module contract, same as ``classifier``/``lm_score``):
log-ratios are quantized to MICRO-nat longs at fit time, scoring is an
exact integer dot product (partition-order independent; two fits on
the same inputs are assert-identical), and resampling keys on
``xxhash64`` of the document id — replayable, append-stable, no
``rand()`` anywhere.

Scale shape: scoring is exploded features ⋈ BROADCAST ratio table (a
hash-map probe per term — hot terms cost nothing extra, no skew
surface) → ONE doc-keyed exact integer aggregation. Selection is
``orderBy(desc).limit(k)`` — Spark plans TakeOrdered (per-partition
top-k + driver merge of k·partitions rows), not a global sort. At
100 TB: the model broadcast is MBs, the corpus never shuffles except
the one doc-keyed agg, and top-k state is O(k) per partition.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# The term-kind fit runs driver-side on seed text lists, so it
# tokenizes in Python — via the ONE shared twin of
# functions/text.py::tokens (a private re-implementation here could
# drift from the Spark tokenizer and break the oracle row).
from ..functions.litarrays import lit_longs, lit_strings  # noqa: E402
from ..functions.text import py_tokens  # noqa: E402  (re-exported)


def py_terms(text: str, bigrams: bool = True) -> list[str]:
    """Unigram + (optionally) space-joined-bigram terms — mirrors
    ``classifier.hashed_features``'s term stream exactly."""
    toks = py_tokens(text)
    out = list(toks)
    if bigrams:
        out.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    return out


def _ratio_table(
    tgt_counts: Mapping, raw_counts: Mapping, space: int, add_k: float
) -> tuple[dict, int]:
    """Per-feature quantized log-likelihood ratios.

    ``ratio_f = ln((c_f^tgt + k)/(T_tgt + k·space)) − ln((c_f^raw +
    k)/(T_raw + k·space))`` in MICRO-nats (Laplace-smoothed over a
    ``space``-sized event space, so unseen features are well-defined).
    Returns ``(table, default)`` where ``table`` holds only features
    whose ratio DIFFERS from the both-unseen default — the broadcast
    ships informative features only."""
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    if space <= 0:
        raise ValueError(f"smoothing space must be positive, got {space}")
    denom_t = math.log(sum(tgt_counts.values()) + add_k * space)
    denom_r = math.log(sum(raw_counts.values()) + add_k * space)
    default = round((math.log(add_k) - denom_t - math.log(add_k) + denom_r) * MICRO)
    table: dict = {}
    for f in set(tgt_counts) | set(raw_counts):
        r = (
            math.log(tgt_counts.get(f, 0) + add_k)
            - denom_t
            - math.log(raw_counts.get(f, 0) + add_k)
            + denom_r
        )
        q = round(r * MICRO)
        if q != default:
            table[f] = q
    return table, int(default)


def _bucket_counts(feats: DataFrame) -> dict[int, int]:
    """feat → Σcnt, collected. Bounded by the BUCKET space (≤ n_buckets
    rows — the hashing trick's scale guarantee), never by corpus size."""
    return {
        r["feat"]: r["c"]
        for r in feats.groupBy("feat").agg(F.sum("cnt").alias("c")).collect()
    }


def fit_hashed_importance(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    n_buckets: int = 1 << 16,
    add_k: float = 0.5,
    bigrams: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Fit the hashed-ngram importance model from two corpora (DSIR's
    form). Two feature passes + two bounded collects (≤ n_buckets rows
    each) + driver arithmetic — O(1) Spark jobs. The raw side may be a
    ``hash_sample`` of the full corpus (the distribution estimate only
    needs a sample; DSIR fits on ~1M docs a side)."""
    from .classifier import hashed_features

    tgt = _bucket_counts(
        hashed_features(target_docs, n_buckets, text_col, id_col, bigrams=bigrams)
    )
    raw = _bucket_counts(
        hashed_features(raw_docs, n_buckets, text_col, id_col, bigrams=bigrams)
    )
    table, default = _ratio_table(tgt, raw, n_buckets, add_k)
    return {
        "kind": "hashed",
        "n_buckets": n_buckets,
        "bigrams": bigrams,
        "add_k": add_k,
        "ratio_micro": table,
        "default_micro": default,
    }


def fit_term_importance(
    target_texts: Iterable[str],
    raw_texts: Iterable[str],
    add_k: float = 0.5,
    bigrams: bool = True,
    space: int | None = None,
) -> dict:
    """Fit a term-string-keyed importance model driver-side from seed
    text lists (pure Python — no Spark, so a registered query can embed
    the result as a literal table on both the Spark and the SQL-oracle
    side, the ``lm_score._lm_model`` pattern). ``space`` defaults to
    the union vocabulary size + 1 (the +1 is the unseen-term event)."""

    def counts(texts: Iterable[str]) -> dict[str, int]:
        c: dict[str, int] = {}
        for t in texts:
            for term in py_terms(t, bigrams):
                c[term] = c.get(term, 0) + 1
        return c

    tgt, raw = counts(target_texts), counts(raw_texts)
    if space is None:
        space = len(set(tgt) | set(raw)) + 1
    table, default = _ratio_table(tgt, raw, space, add_k)
    return {
        "kind": "term",
        "bigrams": bigrams,
        "add_k": add_k,
        "space": space,
        "ratio_micro": table,
        "default_micro": default,
    }


def _term_stream(
    docs: DataFrame, text_col: str, id_col: str, bigrams: bool, toks: DataFrame | None
) -> DataFrame:
    """(id, term) — one row per term OCCURRENCE (unigrams + bigrams):
    ``classifier.term_stream``, delegated (ONE definition — the r11
    shared-stream refactor; the cross-module parity is test-pinned)."""
    from .classifier import term_stream

    return term_stream(docs, text_col, id_col, bigrams=bigrams, toks=toks)


def importance_logweights(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_feats, logw_micro, logw): every document's importance
    log-weight — Σ over its features of the (quantized) target/raw
    log-ratio, matched features via a LEFT join to the BROADCAST ratio
    table, unmatched falling to the model's default ratio. Exact
    integer arithmetic end to end (partition-order independent);
    documents with NULL/empty text surface with ``n_feats = 0`` and
    weight 0 via the final left join — present, not dropped, so a
    selection step sees the whole corpus."""
    spark = docs.sparkSession
    default = int(model["default_micro"])
    if model["kind"] == "hashed":
        from .classifier import hashed_features

        keyed = hashed_features(
            docs, model["n_buckets"], text_col, id_col,
            toks=toks, bigrams=model["bigrams"],
        )
        key = "feat"
        schema = "feat long, r_micro long"
    else:
        keyed = _term_stream(docs, text_col, id_col, model["bigrams"], toks)
        keyed = keyed.withColumn("cnt", F.lit(1).cast("long"))
        key = "term"
        schema = "term string, r_micro long"
    items = list(model["ratio_micro"].items())
    if items:
        rtab = F.broadcast(spark.createDataFrame(items, schema))
        joined = keyed.join(rtab, key, "left")
    else:
        joined = keyed.withColumn("r_micro", F.lit(None).cast("long"))
    sums = joined.groupBy("id").agg(
        F.sum("cnt").alias("_nf"),
        F.sum(F.coalesce(F.col("r_micro"), F.lit(default)) * F.col("cnt")).alias(
            "_lw"
        ),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(sums, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("_nf"), F.lit(0).cast("long")).alias("n_feats"),
            F.coalesce(F.col("_lw"), F.lit(0).cast("long")).alias("logw_micro"),
        )
        .withColumn("logw", F.col("logw_micro").cast("double") / F.lit(1e6))
    )


def select_top_importance(
    scored: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """The top ``k`` documents by importance weight, id-tiebroken —
    deterministic (the argmax form of selection; use
    :func:`importance_resample` for DSIR's sampled form). Plans as
    TakeOrdered: per-partition top-k, driver merges k·partitions rows
    — no global sort shuffle."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    return scored.orderBy(F.desc("logw_micro"), F.col(id_col)).limit(k)


def gumbel_key_expr(
    id_col: str | Column, seed: int = 42, temperature: float = 1.0
) -> Column:
    """``logw/T + Gumbel(0,1)`` — the Gumbel top-k key: taking the k
    largest keys samples k documents WITHOUT replacement with
    probability ∝ exp(logw/T) (the Gumbel-max trick; T→0 recovers
    deterministic top-k, T>1 flattens toward uniform). The noise is a
    pure function of (id, seed): ``u = (pmod(xxhash64(seed, id), 2³⁰)
    + ½)/2³⁰`` → ``−ln(−ln u)`` — replayable, append-stable, never
    ``rand()`` (same contract as ``operators/sampling.py``), and the
    +½ keeps u strictly inside (0,1) so the double ln never hits ±inf."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    key = F.col(id_col) if isinstance(id_col, str) else id_col
    m = 1 << 30
    u = (
        F.pmod(F.xxhash64(F.lit(int(seed)).cast("long"), key), F.lit(m)).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(float(m))
    gumbel = -F.log(-F.log(u))
    return F.col("logw_micro").cast("double") / F.lit(1e6 * float(temperature)) + gumbel


def importance_resample(
    scored: DataFrame,
    k: int,
    seed: int = 42,
    temperature: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR's selection step: ``k`` documents sampled WITHOUT
    replacement with probability ∝ exp(logw/T), via Gumbel top-k over
    :func:`importance_logweights` output. Deterministic per (seed, T);
    a new seed re-deals the sample. Same TakeOrdered plan shape as
    :func:`select_top_importance` — O(k) driver state, no global
    sort."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    key = gumbel_key_expr(id_col, seed, temperature)
    return (
        scored.withColumn("_gk", key)
        .orderBy(F.desc("_gk"), F.col(id_col))
        .limit(k)
        .drop("_gk")
    )


def logweight_expr(model: dict, text_col: str = "text", max_terms: int = 20_000) -> Column:
    """Per-ROW stateless form of :func:`importance_logweights` for a
    TERM-kind model (ratio table as a literal string→long map, term
    fold via ``aggregate``) — same exact micro arithmetic, NULL text
    scores 0. Exists for STREAMING ingest gates (compose with
    ``streaming/corpus.py``: ``df.filter(logweight_expr(m) >= cut)``),
    same reasoning as ``classifier.margin_expr``. ``max_terms`` fuses
    literal-map plan bloat; for big models use the broadcast-join
    scorer."""
    if model["kind"] != "term":
        raise ValueError("logweight_expr requires a term-kind model")
    table = model["ratio_micro"]
    if len(table) > max_terms:
        raise ValueError(
            f"model has {len(table)} ratio entries (> max_terms={max_terms}): "
            "a literal-map expression this large would blow the plan — use "
            "importance_logweights (broadcast-join scoring) instead"
        )
    default = int(model["default_micro"])
    from ..functions import text as tx

    toks = tx.tokens(F.col(text_col) if isinstance(text_col, str) else text_col)
    n = F.size(toks)
    terms = F.concat(
        toks,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        if model["bigrams"]
        else F.array().cast("array<string>"),
    )
    if table:
        rmap = F.map_from_arrays(
            lit_strings(table), lit_longs(table.values())
        )
        total = F.aggregate(
            terms,
            F.lit(0).cast("long"),
            lambda acc, term: acc
            + F.coalesce(F.element_at(rmap, term), F.lit(default).cast("long")),
        )
    else:
        total = F.size(terms).cast("long") * F.lit(default)
    return F.coalesce(total, F.lit(0).cast("long")).cast("double") / F.lit(1e6)
