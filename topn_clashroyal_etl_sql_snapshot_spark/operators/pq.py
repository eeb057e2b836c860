"""Product quantization (PQ) for embedding search at corpus scale.

Public recipe: Jégou, Douze, Schmid 2011, "Product Quantization for
Nearest Neighbor Search" (and the IVF-PQ composition every large ANN
system ships). Split each D-dim vector into M subvectors; fit a K-entry
codebook per subspace; a vector compresses to M small codes (here
``array<int>``; at K=256 that is M BYTES — a 64-dim float vector goes
256 B → 4 B at M=4). Queries stay full precision and score encoded
vectors ASYMMETRICALLY (ADC): dot(q, v) ≈ Σ_m dot(q_m, c_{m,code_m}) —
a table lookup per subspace, never a decode.

Why this matters at 100 TB: IVF-flat (``similarity.ivf_topk``) prunes
CANDIDATES but still ships full vectors into the scoring join; IVF-PQ
scores candidates from the code columns alone — the shuffled payload
shrinks ~64x, and only the final re-rank touches true vectors for the
handful of survivors per query. Reference repo has no similarity
surface at all (its schema is relational rollups); this extends the
mandated ANN family.

Spark-first shape (no model objects, no UDFs):

- **Fit** (:func:`fit_pq_codebooks`) — Lloyd iterations where ONE
  fused job advances ALL M codebooks simultaneously (the exploded
  (id, dim, x) stream already carries the subspace index, so M is a
  grouping key, not a loop bound; the assignment aggregation carries
  the subvector so the mean recompute stacks on it without a second
  corpus pass): job count is O(lloyd_rounds), independent of both
  M and K. Plain L2 k-means —
  PQ quantizes magnitudes too, so inputs are NOT unit-normalized
  (deliberately unlike the spherical ``kmeans_parallel_centroids``).
- **Encode** (:func:`pq_encode`) — nearest code per subspace as
  integer-scaled codegen (argmin ‖x−c‖² ≡ argmax⟨x,c⟩−½‖c‖², the same
  literal-matrix machinery as ``similarity._nearest_centroids``), one
  doc-keyed aggregation.
- **Search** (:func:`pq_topk`) — IVF coarse pruning (reusing the
  similarity module's deterministic pivots) → ADC scoring of
  candidates from codes + per-query lookup tables → exact cosine
  re-rank of the top ``rerank·k`` — so the returned cosines are TRUE
  cosines (PQ only decides which pairs are worth exact scoring).

Determinism (module contract): codebook init is hash-ordered sampling,
Lloyd means aggregate integer-scaled, assignment argmax is
integer-scaled with index tie-break — two fits on the same corpus are
assert-identical (tests/test_pq.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as vx
from ..functions.litarrays import lit_doubles
from .similarity import _nearest_centroids, _spread_vectors, _with_norm, ivf_centroids

# Integer-scale headroom contracts (same analysis as
# similarity.random_projection's 2^30, which this matches — ADVICE r7):
# _TERM_SCALE: the (id, s) dot kernel sums sub_dim rounded terms, so it
#   wraps only when Σ_t |x_t·c_t| exceeds 2^63/2^30 ≈ 8.6e9 per
#   subspace — embeddings with coordinate magnitudes into the tens of
#   thousands stay safe (the old 2^40 wrapped at Σ ≈ 8.4e6, within
#   reach of large-magnitude corpora; PQ deliberately does NOT
#   unit-normalize). Rounding noise is ~sd/2 units of 2^-30 on the
#   scaled dot — far below the 9-decimal cosine tie-break.
# _MEAN_SCALE: the Lloyd mean sums n_cluster rounded coordinates, so
#   n_cluster·|x| must stay under 8.6e9 — guaranteed when the fit is
#   sample-bounded (``sample_rows``, the production setting); an
#   unsampled fit on billions of rows per code should lower the scale.
_TERM_SCALE = float(1 << 30)
_MEAN_SCALE = float(1 << 30)


def _check_model(model: dict) -> None:
    """Validate the persisted model's SHAPE, not just its arithmetic:
    a JSON-round-tripped model truncated to fewer codes/books than it
    claims would make the flat-literal element_at indices read
    MISALIGNED data from the next book — wrong codes and ADC scores
    with no error (r11 review finding)."""
    if model["dim"] != model["m"] * model["sub_dim"]:
        raise ValueError("inconsistent PQ model: dim != m * sub_dim")
    m, k, sd = model["m"], model["k"], model["sub_dim"]
    if len(model["codebooks"]) != m or any(
        len(book) != k for book in model["codebooks"]
    ) or any(
        len(code) != sd for book in model["codebooks"] for code in book
    ):
        raise ValueError(
            f"inconsistent PQ model: codebooks are not {m} books x "
            f"{k} codes x {sd} floats"
        )
    if len(model["norms2"]) != m or any(
        len(book) != k for book in model["norms2"]
    ):
        raise ValueError(
            f"inconsistent PQ model: norms2 is not {m} x {k}"
        )


def _flat_codes(model: dict):
    """The codebooks as ONE FLAT literal array indexed
    ``(s·K + j)·sub_dim + t`` (1-based at the element_at call site).
    The whole model ships inside the plan (M·K·sub_dim doubles: at
    M=8, K=256, D=768 that is ~1.5 MB of literals — fine; far beyond
    that, move the model to a broadcast join, same trade as
    ``classifier.margin_expr``). Built via ``lit_doubles`` (r17): the
    per-element F.lit form cost ~0.4 s of py4j round trips per call,
    and fit/encode/search built this five times per query."""
    return lit_doubles(
        x for book in model["codebooks"] for code in book for x in code
    )


def _flat_norms2(model: dict):
    """Per-code squared norms as a flat literal, indexed ``s·K + j``."""
    return lit_doubles(n for book in model["norms2"] for n in book)


def _dot_frame(
    vecs: DataFrame,
    model: dict,
    id_alias: str = "id",
    with_subvec: bool = False,
) -> DataFrame:
    """(id, s, dots: array<long>): integer-scaled ⟨x_s, c_sj⟩ for ALL K
    codes — the shared kernel of encoding and query-LUT construction.

    Formulation (measured in ONE session on the sf0.1 embeddings,
    D=64/M=4/K=16 — cross-session timings mislead, ±3x drift): K
    compiled SUM columns over the exploded (vector, dim) stream with
    the flat-literal lookup, 0.23 s steady-state, vs 0.30 s for the
    exploded (vector, dim, code) stream with nested literals and
    0.42 s exploded-with-flat. The win is SHAPE-SPECIFIC: for the
    centroid-assignment shape (group = whole vector, not subspace)
    the exploded+nested form wins 5x instead — which is why
    ``similarity._nearest_centroids`` deliberately keeps it. Shuffle
    payload per group here is K longs, bounded by the model, not the
    dimension.

    ``with_subvec`` additionally carries the t-ordered subvector
    values through the same aggregation (``xs: array<double>``) —
    the Lloyd fit's fusion hook: the mean-recompute stage reads the
    coordinates straight off the assignment frame instead of joining
    a second exploded corpus pass (adds sd doubles per group to the
    map-side partial, removes an N·dim shuffle join per round)."""
    flat = _flat_codes(model)
    sd, k = model["sub_dim"], model["k"]
    dims = vecs.select(
        F.col("id").alias(id_alias), F.posexplode("v").alias("d", "x")
    ).select(
        id_alias,
        (F.col("d") / sd).cast("int").alias("s"),
        (F.col("d") % sd).alias("t"),
        "x",
    )
    sums = [
        F.sum(
            F.round(
                F.col("x").cast("double")
                * F.element_at(
                    flat,
                    ((F.col("s") * k + F.lit(j)) * sd + F.col("t") + 1).cast(
                        "int"
                    ),
                )
                * F.lit(_TERM_SCALE)
            ).cast("long")
        ).alias(f"_d{j}")
        for j in range(k)
    ]
    aggs = list(sums)
    if with_subvec:
        aggs.append(
            F.array_sort(F.collect_list(F.struct("t", "x"))).alias("_tx")
        )
    sel = [
        F.col(id_alias),
        F.col("s"),
        F.array(*[F.col(f"_d{j}") for j in range(k)]).alias("dots"),
    ]
    if with_subvec:
        sel.append(F.transform("_tx", lambda p: p["x"]).alias("xs"))
    return dims.groupBy(id_alias, "s").agg(*aggs).select(*sel)


def _assign_codes(
    vecs: DataFrame, model: dict, with_subvec: bool = False
) -> DataFrame:
    """(id, s, code): nearest codebook entry per subspace —
    argmin ‖x−c‖² as argmax of the integer-scaled ⟨x,c⟩ − ½‖c‖²
    (the ‖x‖² term is constant per (id, s) and drops out). The argmax
    is ``array_max`` over (score, −j) structs on the K-sized dots array
    — plain row algebra on the aggregated frame, no second
    shuffle-and-sort window. Ties break toward the lower code index —
    replay-deterministic."""
    n2 = _flat_norms2(model)
    k = model["k"]
    scored = F.transform(
        F.col("dots"),
        lambda dot, j: F.struct(
            (
                dot
                - F.round(
                    F.lit(0.5)
                    * F.element_at(
                        n2, (F.col("s") * k + j + 1).cast("int")
                    )
                    * F.lit(_TERM_SCALE)
                ).cast("long")
            ).alias("score"),
            (-j).alias("nj"),
        ),
    )
    cols = ["id", "s", (-F.array_max(scored)["nj"]).cast("int").alias("code")]
    if with_subvec:
        cols.append(F.col("xs"))
    return _dot_frame(vecs, model, with_subvec=with_subvec).select(*cols)


def _vec_frame(
    embeddings: DataFrame, id_col: str, vec_col: str, dim: int | None = None
) -> DataFrame:
    """(id, v): the double-cast vector stream. With ``dim``, rows whose
    vector is NULL, the wrong width, OR carrying NULL elements are
    EXCLUDED — a short vector would otherwise emit fewer subspaces and
    silently under-sum its codes/ADC scores (review finding), which is
    worse than absence; a NULL element is the same defect one lane
    deep (r11 review finding: it crashed float() when seeded, crashed
    the Lloyd mean when alone in a cluster, and silently under-summed
    encode otherwise — the ivf_centroids fix, applied here)."""
    out = _spread_vectors(embeddings, id_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if dim is not None:
        out = out.filter(
            (F.size("v") == dim)
            & F.forall(F.col("v"), lambda x: x.isNotNull())
        )
    return out


def _assign_codes_hof(vecs: DataFrame, model: dict) -> DataFrame:
    """(id, s, code, xs): the Lloyd round's assignment as PER-ROW
    higher-order functions instead of the exploded K-compiled-SUM
    kernel — the FIT-ONLY twin of :func:`_assign_codes`
    (with_subvec=True), bit-identical by construction (r13, pinned by
    ``tests/test_pq.py``):

    - each scaled term is the SAME expression, ``CAST(round(x · c ·
      2³⁰) AS long)``, folded in the same t-order (long addition is
      exact, so fold ≡ SUM);
    - the argmax is the same (score − round(½‖c‖²·2³⁰), −j) struct
      max with the low-index tie-break.

    Why it exists: the exploded kernel's plan embeds the M·K·sub_dim
    literal array once PER compiled sum column — K copies — and at
    fit time that tree is rebuilt and re-optimized EVERY Lloyd round
    (the codebook literals change), so each round paid ~2-3 s of
    Catalyst + Janino on a 1,000-row sample whose actual compute is
    microseconds (measured r13: a 100-row, 2-round fit cost 9-14 s
    wall; whole-stage codegen off halved only the first fit —
    steady-state was pure analysis cost). The HOF form references the
    literal array ONCE inside a lambda, interpreted per row — exactly
    the shape-specific trade :func:`pq_encode`'s docstring records
    (HOF wins where rows are batch-bounded; the fit's sample IS
    bounded by ``sample_rows``), so encode/search keep the compiled
    kernel for corpus-scale streams and the fit stops paying
    corpus-scale plan costs on sample-scale data."""
    flat, n2 = _flat_codes(model), _flat_norms2(model)
    m, k, sd = model["m"], model["k"], model["sub_dim"]
    s, scale = F.col("s"), F.lit(_TERM_SCALE)

    def term(j, t):
        return F.round(
            F.element_at("xs", (t + 1).cast("int"))
            * F.element_at(flat, ((s * k + j) * sd + t + 1).cast("int"))
            * scale
        ).cast("long")

    def score(j):
        dot = F.aggregate(
            F.sequence(F.lit(0), F.lit(sd - 1)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + term(j, t),
        )
        half_n2 = F.round(
            F.lit(0.5) * F.element_at(n2, (s * k + j + 1).cast("int")) * scale
        ).cast("long")
        return F.struct((dot - half_n2).alias("score"), (-j).alias("nj"))

    scored = F.transform(F.sequence(F.lit(0), F.lit(k - 1)), score)
    return (
        vecs.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            "v",
        )
        .select("id", "s", F.slice("v", s * sd + 1, sd).alias("xs"))
        .select(
            "id",
            "s",
            (-F.array_max(scored)["nj"]).cast("int").alias("code"),
            "xs",
        )
    )


def fit_pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    lloyd_rounds: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int | None = None,
) -> dict:
    """Fit M codebooks of K entries each. Init: the K hash-minimal
    corpus vectors seed code j of EVERY subspace with their j-th
    subvector (deterministic, no RNG). Each Lloyd round advances all
    M·K codes in ONE fused job — the assignment aggregation carries
    the subvectors, and the (s, code, t)-keyed integer-scaled mean
    aggregates directly on top of it — so the whole fit is
    O(lloyd_rounds) jobs regardless of M and K; the collected
    statistics are bounded by the MODEL size (M·K·sub_dim longs),
    never the corpus. Empty codes keep
    their previous center. Returns ``{"m", "k", "sub_dim", "dim",
    "codebooks": [s][j][t], "norms2": [s][j]}``.

    ``sample_rows`` fits on a deterministic hash sample of ≈ that many
    vectors instead of the full corpus — the production setting
    (quantizer training needs a distribution estimate, not every row;
    FAISS-style practice trains PQ on a 10⁵-ish sample regardless of
    index size), making fit cost CONSTANT in corpus size while encode
    and search stay full-corpus."""
    # MAJORITY width, not the first row's: .first() is partition-order
    # dependent, and one corrupt short vector ordered first would set a
    # bogus dim whose filter then silently discards the entire real
    # corpus (review finding). ONE full-corpus width-histogram job
    # yields the mode, the off-width count, AND the total row count
    # the sampler needs (r7 verdict: the separate sampler count() +
    # F.mode agg + filter().count() triple was three scan jobs on the
    # fit's fixed-cost floor; NULL vectors land in the histogram's
    # NULL-width group, so the sampler total includes them exactly as
    # its own count() did). Width stats now describe the corpus, not
    # the sample — strictly stronger for the warning, since encode and
    # search under this model run full-corpus. Ties break (higher
    # count, then smaller width) — deterministic where F.mode's tie
    # choice is arbitrary.
    # null-SAFE width key: a bare F.size(NULL) is -1 under Spark 3.x
    # defaults (spark.sql.legacy.sizeOfNull=true) and NULL under 4.x —
    # the guarded form lands NULL vectors in the NULL group on every
    # config, so the every-vector-NULL ValueError and the off-width
    # accounting are cluster-portable (r9 review finding).
    hist = (
        embeddings.groupBy(
            F.when(
                F.col(vec_col).isNotNull(), F.size(vec_col)
            ).alias("w")
        )
        .count()
        .collect()
    )
    total = sum(int(r["count"]) for r in hist)
    widths = [r for r in hist if r["w"] is not None]
    if not widths:
        raise ValueError(
            "cannot fit PQ codebooks: corpus is empty or every vector is NULL"
        )
    dim = int(max(widths, key=lambda r: (r["count"], -r["w"]))["w"])
    off_width = sum(int(r["count"]) for r in widths if r["w"] != dim)
    if sample_rows is not None:
        from .sampling import hash_sample_target

        embeddings = hash_sample_target(
            embeddings, id_col, sample_rows, total_rows=total
        )
    if off_width:
        import warnings

        warnings.warn(
            f"fit_pq_codebooks: {off_width} vectors differ from the majority "
            f"width {dim} and are excluded from the fit (and from "
            "encode/search under this model)",
            stacklevel=2,
        )
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sd = dim // m
    vecs = _vec_frame(embeddings, id_col, vec_col, dim=dim).localCheckpoint(
        eager=False
    )
    seeds = (
        vecs.orderBy(F.xxhash64(F.col("id")), F.col("id")).limit(k).collect()
    )
    if len(seeds) < k:
        raise ValueError(f"corpus has {len(seeds)} vectors < k={k} codes")
    books = [
        [[float(x) for x in r["v"][s * sd : (s + 1) * sd]] for r in seeds]
        for s in range(m)
    ]

    def _model(bs):
        return {
            "m": m,
            "k": k,
            "sub_dim": sd,
            "dim": dim,
            "codebooks": bs,
            "norms2": [[sum(x * x for x in c) for c in book] for book in bs],
        }

    # ONE fused lineage per Lloyd round (r7 verdict item 3): the
    # assignment frame carries the t-ordered subvector through its own
    # aggregation (``with_subvec``), so the mean-recompute aggregates
    # THAT — explode → (id,s) agg → (s,code) agg → collect, a single
    # job. The prior shape kept a checkpointed (id,s,t,x) corpus
    # explode and shuffle-joined it against the assignment every round
    # — an extra N·dim shuffle per round plus the checkpoint
    # materialization, which at sf0.1 was most of the fit's 12 s
    # fixed-cost floor. r9: the mean stage groups by (s, code) with sd
    # compiled per-coordinate sums instead of re-exploding xs into a
    # (s, code, t)-keyed aggregation — the second shuffle shrinks
    # sd-fold in group count and its map side stops materializing an
    # sd-times-wider row stream (sd is a compile-time constant ≤ a few
    # hundred; same integer-scaled sums, same means, order-free).
    for _ in range(lloyd_rounds):
        # r13: HOF assignment — bit-identical to
        # _assign_codes(with_subvec=True) (test-pinned) at a fraction
        # of the per-round PLAN cost; see _assign_codes_hof.
        assign = _assign_codes_hof(vecs, _model(books))
        stats = (
            assign.groupBy("s", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.round(
                            F.element_at("xs", t + 1) * F.lit(_MEAN_SCALE)
                        ).cast("long")
                    ).alias(f"_sx{t}")
                    for t in range(sd)
                ],
            )
            .collect()
        )
        acc: dict[tuple[int, int], list[float]] = {}
        for r in stats:
            acc[(r["s"], r["code"])] = [
                r[f"_sx{t}"] / (r["n"] * _MEAN_SCALE) for t in range(sd)
            ]
        new_books = [
            [
                acc[(s, j)] if (s, j) in acc else books[s][j]
                for j in range(k)
            ]
            for s in range(m)
        ]
        if new_books == books:
            break
        books = new_books
    return _model(books)


def pq_encode(
    embeddings: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, codes: array<int>): every vector compressed to its M
    nearest-code indices (codes[s] is subspace s's entry). One exploded
    codegen pass + one doc-keyed aggregation; the model rides as plan
    literals. This frame IS the compressed index — persist it instead
    of the vectors and the search path never reloads the corpus
    embeddings except for the final re-rank survivors.

    Adjudicated r9: a zero-shuffle per-row HOF form (the shape that
    won for the query-batch LUT in :func:`pq_topk`) was built,
    verified bit-identical, and measured 2.3x SLOWER here (4.1 vs
    1.8 s at sf0.1) — Spark's array HOFs evaluate interpreted, while
    this exploded form keeps the m·k·sub_dim multiply-adds inside
    whole-stage codegen; on the CORPUS side that compiled-arithmetic
    edge beats saving two linear, partial-aggregated shuffles. Same
    shape-specific trade `_dot_frame`'s docstring records for centroid
    assignment: HOF-per-row wins only where the row count is batch-
    bounded (the query LUT), codegen-explode wins at corpus scale."""
    _check_model(model)
    vecs = _vec_frame(embeddings, id_col, vec_col, dim=model["dim"])
    return (
        _assign_codes(vecs, model)
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda p: p["code"],
            ).alias("codes")
        )
        .select(F.col("id").alias(id_col), "codes")
    )


def pq_topk(
    embeddings: DataFrame,
    model: dict,
    k: int = 10,
    n_coarse: int = 16,
    nprobe: int = 4,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    coarse_centroids: list[tuple[int, list[float], float]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k: coarse pruning → ADC approximate scoring from
    codes → exact cosine re-rank. Returns (query_id, neighbor_id,
    cosine, rank) with TRUE cosines (rank ties at 9 decimals break by
    neighbor id, matching ``ivf_topk``'s contract).

    1. Coarse quantizer: the similarity module's deterministic IVF
       pivots (or a ``kmeans_parallel_centroids`` fit via
       ``coarse_centroids``); corpus assigns to 1 list, queries probe
       ``nprobe`` — candidates come from a (bucket)-keyed join, never
       query × corpus (exception: a FILTERED batch probing every cell
       short-circuits to codes × broadcast-batch, the identical pair
       set without the vacuous coarse passes).
    2. ADC (r9 shape): ONE broadcast query table carries each query's
       LUT as an array cell (computed per row from the literal
       codebook — no shuffle builds it), its norm, and its vector;
       candidates join their UNEXPLODED code row and the approx cosine
       is an O(M) array-lookup fold —
       Σ_m ⟨q_m, c_m,code⟩ / (‖q‖·‖v̂‖), with ‖v̂‖² = Σ_m ‖c_m,code‖²
       EXACT from the subspace decomposition. No corpus vectors in
       this stage — the payload is M ints per candidate.
    3. Re-rank: top ``rerank·k`` per query by approx score (the query
       vector rides the survivor rows) join corpus vectors once for an
       exact cosine; final window keeps k.

    ``codes`` accepts a persisted :func:`pq_encode` frame (the
    compressed index) so repeated searches never re-encode. Recall has
    two knobs: ``nprobe`` (coarse misses) and ``rerank`` (ADC ranking
    noise); at ``nprobe = n_coarse`` and ``rerank·k ≥`` corpus size
    the result equals ``brute_force_topk`` exactly (test-pinned)."""
    _check_model(model)
    if k < 1 or rerank < 1:
        raise ValueError(f"k and rerank must be ≥ 1, got k={k} rerank={rerank}")
    if nprobe < 1 or n_coarse < 1:
        # nprobe=0 would silently return an EMPTY result for every
        # query (r11 review finding) — reject like the other knobs
        raise ValueError(
            f"nprobe and n_coarse must be ≥ 1, got nprobe={nprobe} "
            f"n_coarse={n_coarse}"
        )
    # In full-probe batch mode the centroid list is never consulted —
    # skip the (corpus-scan) fit entirely rather than running one
    # wasted job per search (r11 review finding); nprobe ≥ n_coarse
    # bounds len(cents) without fitting
    full_probe_batch = (
        nprobe >= (
            len(coarse_centroids) if coarse_centroids is not None else n_coarse
        )
        and query_filter is not None
    )
    cents = (
        coarse_centroids
        if coarse_centroids is not None
        else (
            None
            if full_probe_batch
            else ivf_centroids(embeddings, n_coarse, id_col, vec_col)
        )
    )
    # Re-check against the FITTED centroid count: ivf_centroids can
    # return fewer than n_coarse on a small/filtered corpus, and with
    # len(cents) <= nprobe < n_coarse the probed path would pay two
    # extra assignment jobs for an effectively full probe — identical
    # results, wasted work (r11 advisor finding).
    if (
        not full_probe_batch
        and query_filter is not None
        and cents is not None
        and nprobe >= len(cents)
    ):
        full_probe_batch = True
    q = embeddings if query_filter is None else embeddings.filter(query_filter)
    if not full_probe_batch:
        corpus_assign = _nearest_centroids(embeddings, cents, 1, id_col, vec_col)
        query_probe = _nearest_centroids(q, cents, nprobe, id_col, vec_col)
        # No distinct: corpus vectors assign to exactly ONE coarse list
        # (n_keep=1) and a query's probed cells are distinct by
        # construction (row_number over the centroid ranking), so the
        # join emits each (query, neighbor) pair at most once — the
        # dedup the r7 shape paid a full extra shuffle for on the
        # LARGEST intermediate of the search was structurally vacuous.
        cand = (
            query_probe.withColumnRenamed("id", "query_id")
            .join(corpus_assign.withColumnRenamed("id", "neighbor_id"), "cidx")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )

    internal_codes = codes is None
    if internal_codes:
        codes = pq_encode(embeddings, model, id_col, vec_col)
    # named code_norms2, NOT n2: the re-rank frame aliases a COLUMN
    # "n2", and a captured-variable mixup there would silently score
    # with the model's norm table instead of per-vector norms
    code_norms2 = _flat_norms2(model)
    m_, k_ = model["m"], model["k"]

    # Per-query LUT as ONE array cell per query (lut[s][code] = scaled
    # ⟨q_s, c_s,code⟩): the r8 shape exploded this to |Q|·M·K rows AND
    # exploded every candidate's codes to M rows to meet it in a
    # 3-key join followed by a (query, neighbor) re-aggregation — two
    # shuffles of the search's largest intermediate plus an M-way row
    # blowup of the candidate stream, at ANY corpus size. Collapsing
    # the LUT to an array cell turns the whole ADC stage into a narrow
    # projection: candidates join codes ONCE, the M-term sum is an
    # O(M) array lookup per candidate, and the scaled integer sum in
    # fixed s-order is exactly deterministic (the old double-sum
    # depended on partial-agg order below the 9-dp round).
    #
    # ONE query-side table — lut + norm + the query VECTOR itself
    # (qnorm doubles as the re-rank's n1; the r8 shape re-derived both
    # in a separate corpus-frame join at the exact stage). Batched
    # searches now build and broadcast the query side ONCE instead of
    # three times (query ids for candidates, lut, qnorms) plus a
    # re-rank fetch join — each broadcast is its own Spark job, and
    # those four sequential barriers were most of the profiled
    # stage-count floor.
    #
    # The LUT is a NARROW PROJECTION, not an aggregation: the codebook
    # is a plan literal, so lut[s][j] = Σ_t round(x_{s·sd+t}·c·SCALE)
    # folds per ROW with nested HOFs over (m, k, sd) — zero shuffles,
    # zero explode, and the long fold is bit-identical to the exploded
    # SUM it replaces (integer addition is order-free; the per-term
    # rounding is the same expression _dot_frame compiles). The
    # exploded-SUM kernel stays the right shape for ENCODE, where the
    # corpus-scale stream amortizes its shuffle (_dot_frame docstring);
    # the query batch was paying two shuffles + a join of its own
    # build — ~3 of the 9 profiled search jobs — for 40 rows.
    flat = _flat_codes(model)
    sd_ = model["sub_dim"]
    vd = F.col(vec_col).cast("array<double>")
    lut_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m_ - 1)),
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(k_ - 1)),
            lambda j: F.aggregate(
                F.sequence(F.lit(0), F.lit(sd_ - 1)),
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.round(
                    F.element_at(vd, (s * sd_ + t + 1).cast("int"))
                    * F.element_at(
                        flat, ((s * k_ + j) * sd_ + t + 1).cast("int")
                    )
                    * F.lit(_TERM_SCALE)
                ).cast("long"),
            ),
        ),
    )
    qtable = (
        _with_norm(q, vec_col)
        # _vec_frame's gate: width AND no NULL elements — a NULL
        # element makes every LUT/norm fold NULL, so the query would
        # return k arbitrary neighbors all at cosine NULL instead of
        # being absent like other degenerate queries (r11 review)
        .filter(
            (F.size(vd) == model["dim"])
            & F.forall(vd, lambda x: x.isNotNull())
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.col("_norm").alias("qnorm"),
            lut_expr.alias("lut"),
        )
    )

    # Query-side table BROADCAST when the call declares a query BATCH
    # (query_filter given — the ANN serving shape): qtable is |Q| rows
    # of one vector + M·K longs, bounded by the batch, and the hint
    # keeps the candidate stream shuffle-free through the ADC stage.
    # With NO filter the query set IS the corpus (self-search) — a
    # forced broadcast there would ship corpus-sized frames to every
    # executor (r9 review finding), so the unfiltered path leaves join
    # strategy to Catalyst/AQE. Corpus-scale all-pairs similarity
    # belongs to the neardup family anyway (lsh/semantic_neardup_pairs).
    batch_hint = F.broadcast if query_filter is not None else (lambda df: df)
    sidx = F.sequence(F.lit(0), F.lit(m_ - 1))

    def _code_at(s):
        return F.element_at(F.col("_codes"), s + 1)

    codes_sel = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("codes").alias("_codes"),
    )
    if full_probe_batch:
        # Full-probe serving batch (the exact-mode/ADC-contract
        # configuration): every query probes EVERY coarse cell, so the
        # bucket join would emit exactly query-batch × corpus pairs
        # anyway — the two _nearest_centroids passes (each an exploded
        # dim×cells scan + aggregation + window) and the cidx shuffle
        # join prune NOTHING. Short-circuit: the codes scan crossJoins
        # the one broadcast query table directly (no separate candidate
        # frame). The left_semi against the embeddings ids keeps the
        # candidate universe = embeddings ∩ codes, EXACTLY what the
        # probed path's corpus_assign ⋈ codes join yields — without it,
        # a codes index carrying rows since removed from the corpus
        # would win ADC survivor slots and then vanish at the re-rank's
        # vector fetch, returning < k rows (r9 review finding); the
        # semi-join's exchange ships the most compact corpus frames
        # (ids and M-int code rows). Gated on query_filter so an
        # UNFILTERED full-probe self-search (corpus × corpus) still
        # flows through the keyed join rather than a nested-loop
        # cartesian.
        #
        # r17: when the codes frame was built HERE from this very
        # embeddings frame (internal_codes), the semi-join is provably
        # the identity — pq_encode's _vec_frame(dim) gate (non-NULL,
        # right width, no NULL elements) is strictly stronger than the
        # guard's own filter, so codes ids ⊆ guard ids by construction
        # — and is skipped (one exchange + join removed from the plan).
        # A caller-supplied codes index keeps the guard.
        guarded = codes_sel
        if not internal_codes:
            guarded = codes_sel.join(
                # NULL/empty vectors never assign on the probed path
                # (posexplode emits nothing), so they must not be
                # candidates here either: a row whose vector was
                # NULLed after encoding would otherwise ride its stale
                # codes into a survivor slot and re-rank to cosine
                # NULL (r11 review finding — the r9 id-presence fix,
                # one notch deeper)
                embeddings.filter(
                    F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
                ).select(F.col(id_col).alias("neighbor_id")),
                "neighbor_id",
                "left_semi",
            )
        pairs = (
            guarded
            .crossJoin(F.broadcast(qtable))
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
    else:
        pairs = cand.join(codes_sel, "neighbor_id").join(
            batch_hint(qtable), "query_id"
        )
    approx = (
        pairs
        .withColumn(
            "adot",
            F.aggregate(
                sidx,
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.element_at(
                    F.element_at(F.col("lut"), s + 1), _code_at(s) + 1
                ),
            ).cast("double")
            / F.lit(_TERM_SCALE),
        )
        .withColumn(
            "vnorm",
            F.sqrt(
                F.aggregate(
                    sidx,
                    F.lit(0.0),
                    lambda acc, s: acc
                    + F.element_at(
                        code_norms2, (s * k_ + _code_at(s) + 1).cast("int")
                    ),
                )
            ),
        )
        .withColumn(
            "approx_cos",
            F.round(
                F.col("adot")
                / F.when(
                    (F.col("qnorm") > 0) & (F.col("vnorm") > 0),
                    F.col("qnorm") * F.col("vnorm"),
                ),
                9,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc_nulls_last("approx_cos"), F.col("neighbor_id")
    )
    if query_filter is not None:
        # Batch path (r17, guide §2.3 "shuffle keys and metadata, not
        # payloads"): the ADC ranking window shuffles |corpus|·|Q|
        # candidate rows, and carrying the query vector through it made
        # every one of those rows ~dim doubles wide (~540 B at dim 64)
        # for a column only the ≤ |Q|·rerank·k SURVIVORS need. The
        # window now ships (query_id, neighbor_id, approx_cos) — ~25×
        # fewer shuffle bytes — and the survivors re-attach the query
        # vector from the same broadcast-sized qtable (a second
        # broadcast of a |Q|-row table, no shuffle).
        survivors = (
            approx.select("query_id", "neighbor_id", "approx_cos")
            .withColumn("_r", F.row_number().over(wa))
            .filter(F.col("_r") <= rerank * k)
            .select("query_id", "neighbor_id")
            .join(
                F.broadcast(qtable.select("query_id", "_qv", "qnorm")),
                "query_id",
            )
            .select("query_id", "neighbor_id", "_qv", "qnorm")
        )
    else:
        # Self-search (query set = corpus): qtable is corpus-sized, so
        # a re-attach join would be a real shuffle — survivors CARRY
        # the query vector + norm through the window instead (the r9
        # trade, still right for this shape).
        survivors = (
            approx.withColumn("_r", F.row_number().over(wa))
            .filter(F.col("_r") <= rerank * k)
            .select("query_id", "neighbor_id", "_qv", "qnorm")
        )

    vecs = _with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v2"),
        F.col("_norm").alias("n2"),
    )
    # survivors (≤ |Q|·rerank·k rows, one query vector each) broadcast
    # against the corpus vector table — the re-rank never shuffles
    # corpus vectors; same batch-gated contract as qtable above.
    exact = (
        batch_hint(survivors)
        .join(vecs, "neighbor_id")
        .withColumn(
            "cosine",
            F.round(
                vx.cosine_prenormed(
                    vx.dot(F.col("_qv"), F.col("v2")),
                    F.col("qnorm"),
                    F.col("n2"),
                ),
                9,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
