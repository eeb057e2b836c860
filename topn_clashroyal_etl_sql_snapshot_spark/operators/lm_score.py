"""Character n-gram language-model scoring: the CCNet/KenLM-style
quality filter — score each document's perplexity under a small LM
trained on an in-domain reference sample, and gate or bucket on it
(wikipedia-like text scores low, gibberish/boilerplate scores high).

No reference analog; training-pipeline extension mandate. A real
pipeline uses a KenLM binary; the Spark-first re-expression keeps the
exact same shape with a character-trigram model — small enough to fit
in a broadcast, strong enough to separate text from noise — and runs
scoring as pure relational algebra:

- **Training** (:func:`train_char_lm`): driver-side fit on a
  deterministic xxhash64 sample behind a ``max_docs`` fuse (the same
  fixed-sample argument as ``bpe.train_bpe_sampled`` — an LM filter's
  reference model does not improve past a bounded in-domain sample).
  Add-k smoothing over the observed alphabet; returns the model as
  plain data (gram → conditional log-prob, plus per-context floors
  for unseen continuations).
- **Scoring** (:func:`lm_perplexity`): explode each document into its
  char n-grams with the same ``sequence`` → ``explode`` → ``substr``
  codegen pattern as ``operators/chunking.py``, LEFT-join the
  BROADCAST model table on the gram, coalesce misses to the floor
  log-prob, and aggregate per doc id — one broadcast join plus one
  doc-keyed aggregation, no Python in the scoring path. Output:
  ``avg_logprob`` (natural log per char) and ``ppl`` = exp(−avg).

Scale: the model is vocabulary-sized (≤ |alphabet|ⁿ observed grams —
tens of KB at n=3), broadcast once; scoring fans each row into
``len(text)−n+1`` narrow rows inside the scan stage, and the only
shuffle is the per-doc aggregation (partial avg map-side). Skew-free:
gram keys join against a broadcast, never a partitioned table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litarrays import lit_doubles, lit_strings


def fit_char_lm_counts(texts, n: int = 3, add_k: float = 0.5) -> dict:
    """Pure-Python model fit over an in-memory text iterable — the
    counting/smoothing core shared by :func:`train_char_lm` (which
    feeds it a bounded Spark sample) and by callers that need a model
    from a FIXED reference corpus (e.g. the driver-registered
    ``lm_perplexity`` row, whose DuckDB oracle embeds the model as a
    literal table — a data-dependent fit couldn't be mirrored in a
    static SQL string)."""
    gram_counts: dict[str, int] = {}
    ctx_counts: dict[str, int] = {}
    alphabet: set[str] = set()
    for t in texts:
        if t is None:
            continue
        alphabet.update(t)
        for i in range(len(t) - n + 1):
            g = t[i : i + n]
            gram_counts[g] = gram_counts.get(g, 0) + 1
            ctx_counts[g[:-1]] = ctx_counts.get(g[:-1], 0) + 1
    v = len(alphabet) + 1  # +1: one OOV character class
    logp = {
        g: math.log((c + add_k) / (ctx_counts[g[:-1]] + add_k * v))
        for g, c in gram_counts.items()
    }
    ctx_floor = {
        ctx: math.log(add_k / (c + add_k * v)) for ctx, c in ctx_counts.items()
    }
    return {
        "n": n,
        "logp": logp,
        "ctx_floor": ctx_floor,
        "floor": math.log(add_k / (add_k * v)),
    }


def train_char_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    add_k: float = 0.5,
    sample_fraction: float = 1.0,
    max_docs: int = 100_000,
) -> dict:
    """Fit the char n-gram model on a deterministic hash sample.
    Returns ``{"n", "logp": {gram: logp}, "ctx_floor": {ctx: logp},
    "floor": float}``: ``ctx_floor[ctx] = log(k / (C(ctx) + k·V))`` is
    the unseen-CONTINUATION log-prob under a SEEN context (so the
    smoothed distribution per context sums to exactly 1 — a single
    global floor would score unseen grams under well-observed contexts
    several nats too high and shrink the in-domain/gibberish gap the
    filter exists for), and ``floor = log(1/V)`` covers fully unseen
    contexts (V = alphabet size + 1 for OOV)."""
    from .sampling import hash_sample

    s = docs
    if sample_fraction < 1.0:
        # the real sampling operator, so the LM's reference sample
        # shares the bucket space of with_split/hash_sample holdouts
        s = hash_sample(docs, id_col, sample_fraction)
    s = s.select(F.col(text_col).alias("t"))
    n_rows = s.count()
    if n_rows > max_docs:
        raise ValueError(
            f"train_char_lm refuses to collect {n_rows} documents "
            f"(> max_docs={max_docs}); lower sample_fraction — an LM "
            "filter's reference model needs a bounded in-domain sample."
        )
    return fit_char_lm_counts((r["t"] for r in s.collect()), n=n, add_k=add_k)


def lm_avg_logprob_expr(
    model: dict, text_col: str = "text", max_model_entries: int = 20_000
):
    """The per-ROW form of :func:`lm_perplexity`'s score: a single
    stateless column expression (model as literal maps, gram fold via
    ``transform``/``aggregate``) returning the SAME avg_logprob —
    bit-for-bit, same three-level backoff, same micro-nat quantization
    (exact-parity pinned in tests). NULL/short documents yield NULL.

    Exists for STREAMING: the join+groupBy plan in
    :func:`lm_perplexity` is the right batch shape (broadcast model,
    map-side partial agg), but a per-doc groupBy on a stream is a
    stateful aggregation; this expression gates documents inside the
    stateless ingest stack (``streaming/corpus.py``) with batch ≡
    stream parity by construction. The price is literal-map lookups
    instead of a hash join — fine at gate time; prefer
    ``lm_perplexity`` for batch scoring jobs.

    ``max_model_entries`` fuses expression bloat: every model entry
    becomes two literals in the plan, and a 10⁵-gram model would blow
    Catalyst's expression tree — CCNet-style gate models are
    vocabulary-sized (10³-10⁴ grams), which is the supported regime."""
    n = model["n"]
    logp, ctx_floor = model["logp"], model["ctx_floor"]
    if len(logp) + len(ctx_floor) > max_model_entries:
        raise ValueError(
            f"model has {len(logp) + len(ctx_floor)} entries "
            f"(> max_model_entries={max_model_entries}): a literal-map "
            "expression this large would blow the plan — use "
            "lm_perplexity (broadcast-join scoring) instead"
        )
    if not logp or not ctx_floor:
        raise ValueError("model has no grams — fit it before scoring")
    gmap = F.map_from_arrays(
        lit_strings(logp), lit_doubles(logp.values())
    )
    cmap = F.map_from_arrays(
        lit_strings(ctx_floor), lit_doubles(ctx_floor.values())
    )
    floor = float(model["floor"])
    t = F.col(text_col)
    n_g = F.length(t) - (n - 1)
    micro_sum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n_g),
            lambda i: F.round(
                F.coalesce(
                    F.element_at(gmap, t.substr(i, F.lit(n))),
                    F.element_at(cmap, t.substr(i, F.lit(n - 1))),
                    F.lit(floor),
                )
                * F.lit(1e6)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(
        t.isNotNull() & (n_g > 0),
        micro_sum.cast("double") / (n_g.cast("long") * F.lit(1e6)),
    )


def lm_perplexity(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_grams, avg_logprob, ppl) per document. Documents
    shorter than n chars (or NULL) score ``n_grams = 0`` with NULL
    avg/ppl — gate them on length, not perplexity.

    Per-gram log-probs are quantized to MICRO-NATS (round(lp·10⁶) as
    long) before aggregation, so the per-doc sum is an exact integer —
    partition-order independent (a double SUM's low bits depend on the
    executor merge order) and bit-reproducible by the DuckDB oracle of
    the registered driver row. Quantization error ≤ 5·10⁻⁷ nat/char —
    four orders below any perplexity gate anyone sets; determinism is
    the module-wide contract (same device as the integer-scaled dots in
    operators/similarity.py and the DECIMAL money sums in
    plans/testdata_queries.py)."""
    n = model["n"]
    spark = docs.sparkSession
    lm = F.broadcast(
        spark.createDataFrame(
            list(model["logp"].items()), "gram string, logp double"
        )
    )
    ctx_lm = F.broadcast(
        spark.createDataFrame(
            list(model["ctx_floor"].items()), "ctx string, ctx_logp double"
        )
    )
    floor = float(model["floor"])
    base = docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    grams = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("_t").isNotNull() & (F.length("_t") >= n),
                F.sequence(F.lit(1), F.length("_t") - (n - 1)),
            )
        ).alias("_i"),
        F.col("_t"),
    ).select(id_col, F.col("_t").substr(F.col("_i"), F.lit(n)).alias("gram"))
    # three-level backoff: seen gram → seen context's unseen-
    # continuation floor → fully-unseen-context floor; both lookup
    # tables are broadcast, so this is two map-side joins
    scored = (
        grams.withColumn("ctx", F.col("gram").substr(1, n - 1))
        .join(lm, "gram", "left")
        .join(ctx_lm, "ctx", "left")
        .select(
            id_col,
            F.round(
                F.coalesce(F.col("logp"), F.col("ctx_logp"), F.lit(floor))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        (
            F.sum("lp_micro").cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6))
        ).alias("avg_logprob"),
    )
    # left join back so short/NULL docs keep a row with n_grams = 0
    out = (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.col("avg_logprob"),
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        )
    )
    return out
