"""Model-based text classification: hashed n-gram features + logistic
regression, trained AND scored as DataFrame algebra — the idiomatic
Spark-native upgrade over the heuristic ``functions/text.py`` scorers
(``quality_score``/``lang_id``), for when a labeled sample exists.

No reference analog; training-pipeline extension mandate. The design is
the public fastText / Vowpal-Wabbit recipe (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification"; Weinberger et al.
2009 feature hashing): unigram + bigram terms hash into a FIXED bucket
space, a linear model over those buckets separates quality/language
classes at a fraction of an LM's cost, and the hashing trick is what
makes the distributed fit scale-safe — the gradient/weight vector is
bounded by ``n_buckets`` (a few hundred KB), never by the vocabulary.

Scale shape:

- **Features** (:func:`hashed_features`): tokens from the shared
  ``dedup.token_arrays`` scan (one tokenize for the whole dedup/
  classify family), bigrams via ``zip_with`` on the array — all
  codegen; one (id, feat) groupBy.
- **Training** (:func:`train_hashed_logistic`): full-batch gradient
  descent, O(epochs) Spark jobs, independent of corpus size per the
  usual data-parallel reduction: broadcast current weights → per-doc
  margin (one doc-keyed agg) → per-doc error → per-feature gradient
  (one feat-keyed agg, ≤ ``n_buckets`` rows collected). NOT an MLlib
  wrapper — the whole fit is explicit DataFrame algebra.
- **Scoring** (:func:`score_hashed_logistic`): features ⋈ BROADCAST
  weight table → one doc-keyed sum. No Python anywhere in the row
  path; the model ships as a vocabulary-sized table, so hot terms hit
  a hash map, not a partitioned join (no skew surface) — the same
  broadcast-model shape as ``operators/lm_score.py``.

Determinism (module-wide contract): weights live as MICRO-scaled longs
(1e-6 quanta), so per-doc margins are exact integer dot products and
per-feature gradients are exact long sums — partition-order
independent; per-doc errors quantize to micro before entering the
gradient. Two fits on the same data are identical, replay-stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litarrays import lit_longs

MICRO = 1_000_000


def term_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id, term) — one row per term OCCURRENCE: unigram tokens plus
    (optionally) space-joined bigrams. THE single definition of the
    term stream (r11 review finding: this block was copy-pasted across
    hashed_features, score_term_weights, and dsir._term_stream — a
    tokenization or bigram-edge fix had to land in three places or the
    modules silently diverged, and dsir's cross-module parity is
    test-pinned)."""
    from . import dedup

    if toks is None:
        toks = dedup.token_arrays(docs, text_col, id_col)
    terms = toks.select("id", F.explode("toks").alias("term"))
    if bigrams:
        n = F.size("toks")
        big = toks.select(
            "id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(F.col("toks"), 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("term"),
        )
        terms = terms.unionAll(big)
    return terms


def hashed_features(
    docs: DataFrame,
    n_buckets: int = 1 << 18,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
    bigrams: bool = True,
) -> DataFrame:
    """(id, feat, cnt): bag-of-hashed-terms counts per document.

    Terms are unigram tokens plus (by default) space-joined bigrams —
    fastText's n-gram trick, which is what lets a linear model see word
    order; both hash into ``pmod(xxhash64(term), n_buckets)``.
    Collisions are the accepted trade of feature hashing (weights of
    colliding terms share a slot; at 2¹⁸ buckets and natural-language
    vocabularies the accuracy cost is negligible — the public result
    this recipe rests on). Counts stay RAW (integers): normalization
    happens in model space, keeping every downstream aggregation an
    exact long sum. Documents with no tokens produce no rows (their
    margin is the bias alone — handled by the scorers' left join)."""
    terms = term_stream(docs, text_col, id_col, bigrams=bigrams, toks=toks)
    return (
        terms.select(
            "id",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("feat"),
        )
        .groupBy("id", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _margins(
    feats: DataFrame, spark, w_micro: dict[int, int], bias_micro: int
) -> DataFrame:
    """(id, margin_micro): exact integer dot product of raw counts with
    micro-quantized weights, via a BROADCAST weight join. Features whose
    weight is still zero are absent from the table (left join + coalesce
    keeps their contribution at 0 without shipping zeros)."""
    if w_micro:
        wtab = F.broadcast(
            spark.createDataFrame(
                list(w_micro.items()), "feat long, w_micro long"
            )
        )
        joined = feats.join(wtab, "feat", "left")
    else:
        joined = feats.withColumn("w_micro", F.lit(None).cast("long"))
    return joined.groupBy("id").agg(
        (
            F.sum(F.coalesce(F.col("w_micro"), F.lit(0)) * F.col("cnt"))
            + F.lit(bias_micro)
        ).alias("margin_micro")
    )


def train_hashed_logistic(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = 1 << 18,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
    bigrams: bool = True,
    feats: DataFrame | None = None,
) -> dict:
    """Fit a binary logistic model (``label_col``: 0/1 int column) by
    full-batch gradient descent over the hashed features. Returns
    ``{"n_buckets", "bigrams", "bias_micro", "w_micro": {feat: long}}``
    — plug into :func:`score_hashed_logistic`. Pass ``feats`` (a
    checkpointed :func:`hashed_features` result built with the SAME
    n_buckets/bigrams) to share one feature pass across fits — the
    OVR trainer does; labels still come from ``docs``.

    Per epoch (2 shuffles, O(1) jobs — epoch count, not data size,
    bounds the job count): margins via the broadcast weight join →
    per-doc error ``round((sigmoid(margin) − y)·10⁶)`` → per-feature
    gradient ``Σ err_micro·cnt`` (exact long sums, one feat-keyed agg)
    → collect ≤ ``n_buckets + 1`` gradient rows → driver-side update
    with L2, re-quantized to micro. The learning rate is normalized by
    the corpus's mean feature mass (Σcnt/doc) so the default works
    across document lengths. The gradient collect is bounded by the
    BUCKET space — the hashing trick's scale guarantee — never by
    vocabulary or corpus size."""
    spark = docs.sparkSession
    if feats is None:
        feats = hashed_features(
            docs, n_buckets, text_col, id_col, toks=toks, bigrams=bigrams
        ).localCheckpoint(eager=False)
    labels = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(label_col).try_cast("int").alias("y"),
        )
        # NULL labels (including non-numeric strings, which try_cast
        # nulls deliberately — a plain cast RAISES under ANSI) must not
        # reach the gradient: their NULL errors made per-feature sums
        # NULL and crashed the weight update, and they diluted n_docs'
        # learning-rate scaling (r11 review)
        .filter(F.col("y").isNotNull())
        .localCheckpoint(eager=False)
    )
    stats = labels.join(
        feats.groupBy("id").agg(F.sum("cnt").alias("mass")), "id", "left"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.avg("mass"), F.lit(1.0)).alias("avg_mass"),
    ).collect()[0]
    n_docs, avg_mass = stats["n_docs"], max(float(stats["avg_mass"]), 1.0)
    if n_docs == 0:
        return {
            "n_buckets": n_buckets,
            "bigrams": bigrams,
            "bias_micro": 0,
            "w_micro": {},
        }
    # per-count step so lr is length-scale free
    step = lr / (n_docs * avg_mass)

    # gradient frame = features ∪ one bias pseudo-row per labeled doc
    feats_b = feats.unionByName(
        labels.select(
            "id",
            F.lit(-1).cast("long").alias("feat"),
            F.lit(1).cast("long").alias("cnt"),
        )
    ).localCheckpoint(eager=False)

    w_micro: dict[int, int] = {}
    bias_micro = 0
    sig = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-F.col("margin_micro").cast("double") / F.lit(1e6))
    )
    for _ in range(epochs):
        m = _margins(feats, spark, w_micro, bias_micro)
        errs = labels.join(m, "id", "left").select(
            "id",
            F.round(
                (
                    F.coalesce(
                        sig,
                        # docs with no features score the bias alone
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.lit(bias_micro / 1e6))),
                    )
                    - F.col("y")
                )
                * F.lit(MICRO)
            )
            .cast("long")
            .alias("err_micro"),
        )
        # ONE gradient pass per epoch: the bias rides as pseudo-feature
        # -1 (cnt=1 per labeled doc, unreachable from pmod's
        # [0, n_buckets) range), so its gradient Σ err·1 falls out of
        # the same aggregation — the old separate bias collect re-ran
        # the whole margin join every epoch (r11 review finding), and
        # a per-epoch checkpoint would pin epoch-many error frames in
        # the block manager (the OVR comment's reasoning)
        grad_rows = (
            feats_b.join(errs, "id")
            .groupBy("feat")
            .agg(F.sum(F.col("err_micro") * F.col("cnt")).alias("g"))
            .collect()
        )
        bias_g = 0
        for r in grad_rows:
            if r["feat"] == -1:
                bias_g = r["g"] or 0
        for r in grad_rows:
            if r["feat"] == -1:
                continue
            f_id, g = r["feat"], r["g"] or 0
            w = w_micro.get(f_id, 0) / MICRO
            w -= step * (g / MICRO) + lr * l2 * w
            q = round(w * MICRO)
            if q:
                w_micro[f_id] = q
            else:
                w_micro.pop(f_id, None)
        b = bias_micro / MICRO - (lr / n_docs) * (bias_g / MICRO)
        bias_micro = round(b * MICRO)
    return {
        "n_buckets": n_buckets,
        "bigrams": bigrams,
        "bias_micro": bias_micro,
        "w_micro": w_micro,
    }


def score_hashed_logistic(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id_col, margin, prob): every document scored under the model —
    features ⋈ broadcast weights, one doc-keyed exact integer sum, then
    sigmoid. Documents with no tokens (or NULL text) score the bias
    alone via the left join. No Python in the row path. ``feats``
    shares one feature pass across models (see
    :func:`train_hashed_logistic`)."""
    spark = docs.sparkSession
    if feats is None:
        feats = hashed_features(
            docs,
            model["n_buckets"],
            text_col,
            id_col,
            toks=toks,
            bigrams=model["bigrams"],
        )
    m = _margins(feats, spark, model["w_micro"], model["bias_micro"])
    base = docs.select(F.col(id_col).alias("id"))
    return (
        base.join(m, "id", "left")
        .select(
            F.col("id").alias(id_col),
            (
                F.coalesce(
                    F.col("margin_micro"), F.lit(model["bias_micro"])
                ).cast("double")
                / F.lit(1e6)
            ).alias("margin"),
        )
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
    )


def margin_expr(model: dict, text_col: str = "text", max_weights: int = 20_000):
    """The per-ROW form of :func:`score_hashed_logistic`'s margin: one
    stateless column expression (sparse weights as a literal long→long
    map, term fold via ``aggregate``) returning the SAME margin —
    exact, same hashing, same micro arithmetic (parity pinned in
    tests). NULL text yields the bias margin, like the scorer's left
    join.

    Exists for STREAMING, same reasoning as
    ``lm_score.lm_avg_logprob_expr``: the join+groupBy scoring plan is
    the right batch shape, but per-doc grouping on a stream is
    stateful; this expression gates documents inside a stateless
    ingest stack (compose with ``streaming/corpus.py``:
    ``df.filter(1/(1+exp(-margin_expr(m))) >= 0.5)``). ``max_weights``
    fuses expression bloat — trained gate models are sparse (hundreds
    to thousands of non-zero buckets); for dense models use
    :func:`score_hashed_logistic`."""
    w_micro = model["w_micro"]
    if len(w_micro) > max_weights:
        raise ValueError(
            f"model has {len(w_micro)} non-zero weights "
            f"(> max_weights={max_weights}): a literal-map expression this "
            "large would blow the plan — use score_hashed_logistic "
            "(broadcast-join scoring) instead"
        )
    n_buckets = model["n_buckets"]
    bias = int(model["bias_micro"])
    t = F.col(text_col)
    from ..functions import text as tx

    toks = tx.tokens(t)
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
    if w_micro:
        wmap = F.map_from_arrays(
            lit_longs(w_micro), lit_longs(w_micro.values())
        )
        lookup = lambda term: F.coalesce(  # noqa: E731
            F.element_at(wmap, F.pmod(F.xxhash64(term), F.lit(n_buckets))),
            F.lit(0).cast("long"),
        )
        total = F.aggregate(
            terms, F.lit(0).cast("long"), lambda acc, term: acc + lookup(term)
        )
    else:
        total = F.lit(0).cast("long")
    return (
        F.coalesce(total, F.lit(0).cast("long")) + F.lit(bias).cast("long")
    ).cast("double") / F.lit(1e6)


def score_term_weights(
    docs: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
    bigrams: bool = False,
) -> DataFrame:
    """(id_col, n_hits, margin_micro, margin): every document scored
    against a CURATED term→weight list — the interpretable sibling of
    :func:`score_hashed_logistic` for when the model is a hand-audited
    wordlist rather than a trained weight vector (C4's badword filter,
    Dolma's taxonomy gates, domain allow/deny lexicons). Same plan
    shape as the hashed scorer: exploded terms ⋈ BROADCAST weight
    table → one doc-keyed exact integer sum (weights quantized to
    micro longs on the driver, so margins are partition-order
    independent) → left join back so empty/NULL-text documents score
    the bias alone with ``n_hits = 0``.

    Unlike the hashed path the join key is the raw term STRING — no
    collision surface, every contribution attributable to a listed
    term (``n_hits`` counts matched term occurrences). Wordlists are
    102-105 terms, so the broadcast is trivially small; hot terms cost
    a hash-map probe, not a skewed shuffle. ``bigrams=True`` extends
    matching to space-joined token bigrams ("hash table"), same as
    :func:`hashed_features`.

    Wordlist keys are normalized through the SAME tokenizer as the
    corpus (``text.py_tokens``, the mandated driver-side twin) before
    the join — a raw 'Viagra' or "don't" key would otherwise never
    match the lowercased alphanumeric token stream and score 0 hits
    silently (r11 review finding). A key that normalizes to nothing,
    to more words than the stream carries (2 with ``bigrams=True``,
    else 1), or to the same term as another key raises: a hand-audited
    list deserves loud validation, not silent dead entries."""
    from ..functions.text import py_tokens

    spark = docs.sparkSession
    terms = term_stream(docs, text_col, id_col, bigrams=bigrams, toks=toks)
    max_words = 2 if bigrams else 1
    norm_weights: dict[str, float] = {}
    for key, w in weights.items():
        kt = py_tokens(key)
        if not kt:
            raise ValueError(
                f"wordlist key {key!r} normalizes to no tokens — it can "
                "never match"
            )
        if len(kt) > max_words:
            raise ValueError(
                f"wordlist key {key!r} normalizes to {len(kt)} words; the "
                f"term stream carries at most {max_words} "
                f"(bigrams={bigrams}) — it can never match"
            )
        norm = " ".join(kt)
        if norm in norm_weights:
            raise ValueError(
                f"wordlist keys collide after normalization on {norm!r} — "
                "merge their weights explicitly"
            )
        norm_weights[norm] = w
    bias_micro = int(round(bias * MICRO))
    wtab = F.broadcast(
        spark.createDataFrame(
            [(t, int(round(w * MICRO))) for t, w in norm_weights.items()],
            "term string, w_micro long",
        )
    )
    sums = (
        terms.join(wtab, "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("w_micro").alias("w_sum"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(sums, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            (
                F.coalesce(F.col("w_sum"), F.lit(0).cast("long"))
                + F.lit(bias_micro)
            ).alias("margin_micro"),
        )
        .withColumn("margin", F.col("margin_micro").cast("double") / F.lit(1e6))
    )


def train_hashed_logistic_ovr(
    docs: DataFrame,
    label_col: str,
    classes: list[str] | None = None,
    n_buckets: int = 1 << 18,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
    bigrams: bool = True,
    feats: DataFrame | None = None,
    max_grad_rows: int = 10_000_000,
) -> dict:
    """One-vs-rest multiclass, BATCHED: every class's binary problem
    advances through each epoch in the SAME two aggregations — the
    per-(doc, class) error pass and the per-(class, feature) gradient
    pass — so job count is O(epochs), independent of the class count
    (a sequential per-class loop is O(C·epochs) driver round-trips; a
    50-language gate would pay 1500 rounds). The per-class problems
    are mathematically independent, so this produces EXACTLY the
    models the sequential loop would — same integer arithmetic, same
    update order — which the tests pin by equality against per-class
    :func:`train_hashed_logistic` runs.

    Returns ``{"classes": [...], "models": {cls: model}}``; class list
    defaults to the distinct labels, sorted — deterministic. The
    feature pass runs ONCE (shared checkpointed frame). Driver pulls
    per epoch are bounded by C × observed-buckets gradient rows —
    fused up front via ``max_grad_rows`` (one distinct-count job);
    beyond it, shard the class list across calls."""
    spark = docs.sparkSession
    if classes is None:
        classes = sorted(
            r[label_col]
            for r in docs.select(label_col).distinct().collect()
            if r[label_col] is not None
        )
    if feats is None:
        feats = hashed_features(
            docs, n_buckets, text_col, id_col, toks=toks, bigrams=bigrams
        ).localCheckpoint(eager=False)
    n_observed = feats.select("feat").distinct().count()
    if len(classes) * n_observed > max_grad_rows:
        raise ValueError(
            f"{len(classes)} classes x {n_observed} observed feature buckets "
            f"= {len(classes) * n_observed} gradient rows per epoch "
            f"(> max_grad_rows={max_grad_rows}): shard the class list "
            "across train_hashed_logistic_ovr calls, or shrink n_buckets."
        )
    labels = (
        docs.select(
            F.col(id_col).alias("id"),
            # string-cast so int/str label columns both round-trip
            # through the driver-built class table (r11 review: an int
            # label column crashed createDataFrame's 'cls string'
            # schema); NULL labels are excluded — they made every
            # class's y NULL and the NULL gradient sums crashed the
            # weight update
            F.col(label_col).cast("string").alias("_lbl"),
        )
        .filter(F.col("_lbl").isNotNull())
        .localCheckpoint(eager=False)
    )
    stats = labels.join(
        feats.groupBy("id").agg(F.sum("cnt").alias("mass")), "id", "left"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.avg("mass"), F.lit(1.0)).alias("avg_mass"),
    ).collect()[0]
    n_docs, avg_mass = stats["n_docs"], max(float(stats["avg_mass"]), 1.0)
    empty = {
        "n_buckets": n_buckets, "bigrams": bigrams,
        "bias_micro": 0, "w_micro": {},
    }
    if n_docs == 0 or not classes:
        return {"classes": classes, "models": {c: dict(empty) for c in classes}}
    step = lr / (n_docs * avg_mass)

    cls_df = spark.createDataFrame(
        [(i, str(c)) for i, c in enumerate(classes)], "ci int, cls string"
    )
    ylab = (
        labels.crossJoin(F.broadcast(cls_df))
        .select(
            "id", "ci", (F.col("_lbl") == F.col("cls")).cast("int").alias("y")
        )
        .localCheckpoint(eager=False)
    )
    feats_b = feats.unionByName(
        labels.select(
            "id",
            F.lit(-1).cast("long").alias("feat"),
            F.lit(1).cast("long").alias("cnt"),
        )
    ).localCheckpoint(eager=False)
    w_micro: list[dict[int, int]] = [dict() for _ in classes]
    bias_micro: list[int] = [0 for _ in classes]
    for _ in range(epochs):
        wrows = [
            (ci, f_id, w)
            for ci, wm in enumerate(w_micro)
            for f_id, w in wm.items()
        ]
        if wrows:
            wtab = F.broadcast(
                spark.createDataFrame(wrows, "ci int, feat long, w_micro long")
            )
            margins = (
                feats.join(wtab, "feat")
                .groupBy("id", "ci")
                .agg(F.sum(F.col("w_micro") * F.col("cnt")).alias("_mm"))
            )
            joined = ylab.join(margins, ["id", "ci"], "left")
        else:
            joined = ylab.withColumn("_mm", F.lit(None).cast("long"))
        bias_tab = F.broadcast(
            spark.createDataFrame(
                list(enumerate(bias_micro)), "ci int, _bias long"
            )
        )
        margin_micro = F.coalesce(F.col("_mm"), F.lit(0)) + F.col("_bias")
        sig = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-margin_micro.cast("double") / F.lit(1e6))
        )
        # NOT checkpointed: a per-epoch localCheckpoint would pin
        # `epochs` materialized (n_docs × n_classes)-row frames in the
        # block manager until GC + ContextCleaner caught up (review
        # finding) — and since r11 there is only ONE consumer anyway:
        # the bias gradient rides the same aggregation as the feature
        # gradients via pseudo-feature -1
        errs = joined.join(bias_tab, "ci").select(
            "id",
            "ci",
            F.round((sig - F.col("y")) * F.lit(MICRO))
            .cast("long")
            .alias("err_micro"),
        )
        grad_rows = (
            feats_b.join(errs, "id")
            .groupBy("ci", "feat")
            .agg(F.sum(F.col("err_micro") * F.col("cnt")).alias("g"))
            .collect()
        )
        bias_rows = {
            r["ci"]: r["g"] or 0 for r in grad_rows if r["feat"] == -1
        }
        for r in grad_rows:
            if r["feat"] == -1:
                continue
            ci, f_id, g = r["ci"], r["feat"], r["g"] or 0
            w = w_micro[ci].get(f_id, 0) / MICRO
            w -= step * (g / MICRO) + lr * l2 * w
            q = round(w * MICRO)
            if q:
                w_micro[ci][f_id] = q
            else:
                w_micro[ci].pop(f_id, None)
        for ci in range(len(classes)):
            b = bias_micro[ci] / MICRO - (lr / n_docs) * (
                bias_rows.get(ci, 0) / MICRO
            )
            bias_micro[ci] = round(b * MICRO)
    return {
        "classes": classes,
        "models": {
            cls: {
                "n_buckets": n_buckets,
                "bigrams": bigrams,
                "bias_micro": bias_micro[ci],
                "w_micro": dict(w_micro[ci]),
            }
            for ci, cls in enumerate(classes)
        },
    }


def score_hashed_logistic_ovr(
    docs: DataFrame,
    ovr: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id_col, predicted, margin): argmax class per document over the
    per-class margins (ties break toward the first class in the sorted
    class list — deterministic). ONE feature pass and ONE batched
    margin aggregation for ALL classes — the same (ci, feat) broadcast
    weight-table shape the OVR trainer uses, so scoring stays one
    doc-keyed pass independent of class count (r11 review finding: the
    old per-class loop ran C aggregations and a C-deep left-join
    tree)."""
    classes = list(ovr["classes"])
    if not classes:
        raise ValueError(
            "ovr model has no classes (an empty or all-NULL-label fit) "
            "— nothing to score"
        )
    first = ovr["models"][classes[0]]
    for cls in classes:
        m = ovr["models"][cls]
        if (m["n_buckets"], m["bigrams"]) != (
            first["n_buckets"],
            first["bigrams"],
        ):
            raise ValueError(
                f"model for class {cls!r} was fit with different feature "
                "parameters (n_buckets/bigrams) — the shared feature pass "
                "would silently score it wrong"
            )
    spark = docs.sparkSession
    feats = hashed_features(
        docs,
        first["n_buckets"],
        text_col,
        id_col,
        toks=toks,
        bigrams=first["bigrams"],
    )
    wrows = [
        (ci, f, w)
        for ci, cls in enumerate(classes)
        for f, w in ovr["models"][cls]["w_micro"].items()
    ]
    base = docs.select(F.col(id_col).alias("id"))
    cls_idx = spark.createDataFrame(
        [(i,) for i in range(len(classes))], "ci int"
    )
    pairs = base.crossJoin(F.broadcast(cls_idx))
    if wrows:
        wtab = F.broadcast(
            spark.createDataFrame(wrows, "ci int, feat long, w_micro long")
        )
        mm = (
            feats.join(wtab, "feat")
            .groupBy("id", "ci")
            .agg(F.sum(F.col("w_micro") * F.col("cnt")).alias("_mm"))
        )
        pairs = pairs.join(mm, ["id", "ci"], "left")
    else:
        pairs = pairs.withColumn("_mm", F.lit(None).cast("long"))
    bias_tab = F.broadcast(
        spark.createDataFrame(
            [
                (i, int(ovr["models"][c]["bias_micro"]))
                for i, c in enumerate(classes)
            ],
            "ci int, _bias long",
        )
    )
    scored = pairs.join(bias_tab, "ci").withColumn(
        "margin_micro", F.coalesce(F.col("_mm"), F.lit(0)) + F.col("_bias")
    )
    # argmax with ties toward the LOWEST class index — the old
    # coalesce-in-class-order semantics, as one max_by
    best = scored.groupBy("id").agg(
        F.max_by(
            F.struct(F.col("ci").alias("ci"), F.col("margin_micro").alias("mm")),
            F.struct(
                F.col("margin_micro").alias("m"), (-F.col("ci")).alias("nc")
            ),
        ).alias("_b")
    )
    pred = F.coalesce(
        *[
            F.when(F.col("_b.ci") == i, F.lit(c))
            for i, c in enumerate(classes)
        ]
    )
    return best.select(
        F.col("id").alias(id_col),
        pred.alias("predicted"),
        (F.col("_b.mm").cast("double") / F.lit(1e6)).alias("margin"),
    )
