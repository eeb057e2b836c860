"""Similarity-search tests: brute-force top-k vs numpy ground truth;
hyperplane-LSH near-dup recall on planted near-identical vectors."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import similarity

DIM = 16


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(11)
    vecs = {}
    for i in range(40):
        vecs[i] = [rng.gauss(0, 1) for _ in range(DIM)]
    # planted near-duplicates: tiny perturbations of vectors 0..2
    for j, src in enumerate((0, 1, 2)):
        vecs[100 + j] = [x + rng.gauss(0, 0.01) for x in vecs[src]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    return df, vecs


def test_brute_force_topk_matches_numpy(spark, vectors):
    df, vecs = vectors
    got = similarity.brute_force_topk(
        df, k=3, query_filter=F.col("vec_id") < 5
    ).collect()
    by_query: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # float32 storage: compute ground truth on the float32-rounded values
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs32 = {i: [f32(x) for x in v] for i, v in vecs.items()}
    for q in range(5):
        scores = sorted(
            ((round(_cos(vecs32[q], vecs32[o]), 9), -o) for o in vecs32 if o != q),
            reverse=True,
        )
        want = [-negid for _, negid in scores[:3]]
        assert by_query[q] == want, (q, by_query[q], want)


def test_topk_planted_neighbor_first(spark, vectors):
    df, _ = vectors
    got = similarity.brute_force_topk(df, k=1, query_filter=F.col("vec_id") < 3).collect()
    top = {r["query_id"]: r["neighbor_id"] for r in got}
    assert top == {0: 100, 1: 101, 2: 102}


def test_lsh_neardup_recalls_planted(spark, vectors):
    df, _ = vectors
    got = {
        (r["id1"], r["id2"])
        for r in similarity.lsh_neardup_pairs(df, threshold=0.99, planes=8).collect()
    }
    # cosine ≈ 0.9999 pairs collide in all 8 sign bits with near-certainty
    assert {(0, 100), (1, 101), (2, 102)} <= got
    # and nothing unrelated sneaks past the exact-cosine verification
    assert got == {(0, 100), (1, 101), (2, 102)}


def test_bruteforce_neardup_equals_lsh_verified(spark, vectors):
    df, _ = vectors
    bf = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.brute_force_neardup_pairs(df, threshold=0.99).collect()
    }
    lsh = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.lsh_neardup_pairs(df, threshold=0.99, planes=8).collect()
    }
    assert lsh <= bf and len(bf) == 3


def test_ivf_topk_prunes_and_recalls_on_clustered_data(spark):
    """IVF-flat with nprobe ≪ n_centroids reproduces brute force exactly
    when the corpus HAS cluster structure (the regime IVF is for; the
    synthetic testdata embeddings are isotropic, where no partitioning
    scheme can prune — that's why the registered driver query stays on
    the exact path)."""
    rng = random.Random(3)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(6)]
    rows = []
    for i in range(240):
        c = centers[i % 6]
        rows.append((i, [float(x + rng.gauss(0, 0.05)) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(
            df, k=3, query_filter=F.col("vec_id") < 12
        ).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.ivf_topk(
            df, k=3, n_centroids=12, nprobe=3, query_filter=F.col("vec_id") < 12
        ).collect()
    }
    assert ivf == bf


def test_multirotation_lsh_full_recall_low_threshold(spark, vectors):
    """Multi-rotation LSH at a permissive threshold (the adversarial
    regime for sign-bit sketches) still reproduces brute force exactly,
    cosine values included (same fixed-order dot fold)."""
    df, _ = vectors
    bf = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.brute_force_neardup_pairs(df, threshold=0.5).collect()
    }
    lsh = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.lsh_neardup_pairs(
            df, threshold=0.5, planes=3, rotations=16
        ).collect()
    }
    assert lsh == bf and len(bf) >= 3


def test_bruteforce_neardup_max_rows_fuse(spark, vectors):
    """The all-pairs plan must refuse, not silently run, a corpus above
    its row bound (r4 verdict: no unguarded crossJoin reachable from the
    registry)."""
    import pytest

    df, _ = vectors
    with pytest.raises(ValueError, match="refuses an all-pairs plan"):
        similarity.brute_force_neardup_pairs(df, threshold=0.9, max_rows=2)
    # Under the bound (or explicitly unbounded) it still runs.
    assert similarity.brute_force_neardup_pairs(
        df, threshold=0.999, max_rows=None
    ).count() >= 0


@pytest.fixture(scope="module")
def clustered(spark):
    """6 tight clusters of 10 vectors each: the regime semantic dedup
    is built for. Intra-cluster cosines ≈ 0.999; inter-cluster cosines
    are far below any dedup threshold."""
    rng = random.Random(5)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(6)]
    rows = []
    for i in range(60):
        c = centers[i % 6]
        rows.append((i, [float(x + rng.gauss(0, 0.01)) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_semantic_pairs_exhaustive_assign_equals_bruteforce(spark, vectors):
    """n_assign = n_centroids makes every pair share a cluster, so the
    cluster-bucketed plan must reproduce brute force exactly, cosine
    values included (shared exact_cosine_for_pairs tail)."""
    df, _ = vectors
    bf = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.brute_force_neardup_pairs(df, threshold=0.99).collect()
    }
    sem = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.semantic_neardup_pairs(
            df, threshold=0.99, n_centroids=8, n_assign=8
        ).collect()
    }
    assert sem == bf and len(bf) == 3


def test_ivf_topk_accepts_kcenter_centroids(spark, clustered):
    """ivf_topk with farthest-point pivots and nprobe=1 on clustered
    data still reproduces brute force — every query's neighbors live
    in its own (correctly pivoted) cluster."""
    cents = similarity.kcenter_centroids(clustered, 6)
    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(
            clustered, k=3, query_filter=F.col("vec_id") < 6
        ).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.ivf_topk(
            clustered, k=3, nprobe=1, query_filter=F.col("vec_id") < 6,
            centroids=cents,
        ).collect()
    }
    assert ivf == bf


def test_kcenter_places_one_pivot_per_cluster(spark, clustered):
    """Greedy farthest-point pivots must cover all 6 well-separated
    clusters with exactly one pivot each (a hash-sampled 6 collides —
    measured {0,2,2,4,5,5} on this fixture — which is why semantic
    dedup does not use ivf_centroids)."""
    cents = similarity.kcenter_centroids(clustered, 6)
    assert len(cents) == 6
    # recover each pivot's true cluster by matching against the fixture
    rows = {r["vec_id"]: list(r["embedding"]) for r in clustered.collect()}
    owners = []
    for _, vec, _ in cents:
        best = max(rows, key=lambda i: _cos(rows[i], vec))
        owners.append(best % 6)
    assert sorted(owners) == [0, 1, 2, 3, 4, 5]


def test_kcenter_small_corpus_returns_every_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = similarity.kcenter_centroids(df, 5)
    assert len(cents) == 2  # corpus smaller than k: stop, don't duplicate


def test_semantic_pairs_clustered_recall_and_precision(spark, clustered):
    """On clustered data (SemDeDup's regime) the single-assignment plan
    recovers every true pair — near-dups co-assign to the same nearest
    pivot — and precision is exact by construction."""
    bf = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.brute_force_neardup_pairs(
            clustered, threshold=0.95
        ).collect()
    }
    sem = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.semantic_neardup_pairs(
            clustered, threshold=0.95, n_centroids=6, n_assign=1
        ).collect()
    }
    assert sem <= bf  # precision: every emitted pair is a true pair
    assert sem == bf  # recall on clustered data
    # 6 clusters × C(10,2) intra-cluster pairs
    assert len(bf) == 6 * 45


def test_semantic_dedup_keep_drop(spark, clustered):
    """KEEP/DROP must equal a Python union-find over the brute-force
    pair set: one keeper (min id) per semantic cluster."""
    bf_pairs = [
        (r["id1"], r["id2"])
        for r in similarity.brute_force_neardup_pairs(
            clustered, threshold=0.95
        ).collect()
    ]
    want = _union_find(bf_pairs)
    got = {
        r["id"]: (r["component"], r["keep"])
        for r in similarity.semantic_dedup(
            clustered, threshold=0.95, n_centroids=6, n_assign=1
        ).collect()
    }
    assert got == {x: (c, x == c) for x, c in want.items()}
    # 6 components, keepers are ids 0..5 (the per-cluster minima)
    assert {c for c, _ in got.values()} == set(range(6))
    assert {x for x, (c, k) in got.items() if k} == set(range(6))


def test_semantic_pairs_no_cartesian_in_plan(spark, clustered):
    """The scale contract: candidate generation is a cluster-key join —
    no CartesianProduct / BroadcastNestedLoopJoin node anywhere."""
    plan = (
        similarity.semantic_neardup_pairs(
            clustered, threshold=0.95, n_centroids=6, n_assign=1
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_full_probe_equals_exact_on_isotropic_testdata(spark):
    """nprobe = n_centroids means no partition is skipped, so IVF must
    reproduce brute force EXACTLY even on isotropic embeddings where no
    clustering structure exists — the boundary case that proves the
    bucketed plumbing (assignment, probe join, verify) loses nothing."""
    from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import read_testdata

    emb = read_testdata(spark, "/root/testdata/sf0.001", "embeddings")
    from pyspark.sql import functions as F

    flt = F.col("vec_id") < 5
    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(emb, k=3, query_filter=flt).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.ivf_topk(
            emb, k=3, n_centroids=8, nprobe=8, query_filter=flt
        ).collect()
    }
    assert ivf == bf and len(bf) == 15


# ---------------------------------------------------------------------------
# k-means|| fit (kmeans_parallel_centroids)
# ---------------------------------------------------------------------------


def test_kmeans_parallel_one_center_per_cluster(spark, clustered):
    """The distributed fit must cover all 6 well-separated clusters with
    exactly one center each — the same structural-recall bar
    kcenter_centroids is held to."""
    cents = similarity.kmeans_parallel_centroids(clustered, 6)
    assert len(cents) == 6
    rows = {r["vec_id"]: list(r["embedding"]) for r in clustered.collect()}
    owners = []
    for _, vec, _ in cents:
        best = max(rows, key=lambda i: _cos(rows[i], vec))
        owners.append(best % 6)
    assert sorted(owners) == [0, 1, 2, 3, 4, 5]


def test_kmeans_parallel_semantic_pairs_equal_bruteforce(spark, clustered):
    """semantic_neardup_pairs fed a k-means|| fit reproduces brute force
    on clustered data — recall parity with the kcenter path, cosine
    values included (shared exact-cosine verify)."""
    cents = similarity.kmeans_parallel_centroids(clustered, 6)
    bf = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.brute_force_neardup_pairs(
            clustered, threshold=0.95
        ).collect()
    }
    sem = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.semantic_neardup_pairs(
            clustered, threshold=0.95, centroids=cents
        ).collect()
    }
    assert sem == bf and len(bf) == 6 * 45  # 6 clusters x C(10,2)


def test_kmeans_parallel_deterministic(spark, clustered):
    """No RNG state anywhere: two independent fits are identical,
    vector-for-vector (hash-derived sampling + integer-scaled sums)."""
    a = similarity.kmeans_parallel_centroids(clustered, 6)
    b = similarity.kmeans_parallel_centroids(clustered, 6)
    assert a == b


def test_kmeans_parallel_small_corpus(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = similarity.kmeans_parallel_centroids(df, 5)
    assert len(cents) == 2


@pytest.fixture(scope="module")
def many_clustered(spark):
    """20 tight clusters x 15 vectors: big enough that the k-means||
    reduce step (candidates > k) actually runs."""
    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(20)]
    rows = []
    for i in range(300):
        c = centers[i % 20]
        rows.append((i, [float(x + rng.gauss(0, 0.01)) for x in c]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_parallel_job_count_independent_of_k(spark, many_clustered):
    """THE scale contract vs kcenter_centroids: Spark job count is
    O(init_rounds + lloyd_rounds), NOT O(k). Doubling k must not grow
    the number of driver round-trips (kcenter at k=40 would launch ~80
    jobs; the parallel fit stays constant)."""
    many_clustered.count()  # materialize fixture off the measured groups
    sc = spark.sparkContext

    def jobs_for(k):
        group = f"kmeans-fit-k{k}"
        sc.setJobGroup(group, "kmeans job-count pin")
        try:
            cents = similarity.kmeans_parallel_centroids(many_clustered, k)
        finally:
            sc.setJobGroup(None, None)
        assert len(cents) == k
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j10, j40 = jobs_for(10), jobs_for(40)
    # same rounds -> same job shape; allow tiny slack for early-exit paths
    assert j40 <= j10 + 2, (j10, j40)
    # fixed budget regardless of k (rounds x {checkpoint, psi, sample} +
    # weighting + lloyd x {assign-stats}; take/limit runs incremental
    # sub-jobs) — kcenter at k=40 would be ~2 jobs PER pivot on top
    assert j40 <= 60, (j10, j40)


def test_kmeans_parallel_covers_20_clusters(spark, many_clustered):
    """k = true cluster count on 20 clusters: every cluster gets exactly
    one center (k-means|| oversampling + weighted reduce must not merge
    or split tight clusters)."""
    cents = similarity.kmeans_parallel_centroids(many_clustered, 20)
    rows = {r["vec_id"]: list(r["embedding"]) for r in many_clustered.collect()}
    owners = []
    for _, vec, _ in cents:
        best = max(rows, key=lambda i: _cos(rows[i], vec))
        owners.append(best % 20)
    assert sorted(owners) == list(range(20))


def test_centroids_for_corpus_sizes_k_and_recalls(spark, many_clustered):
    """k derives from corpus size (300 docs / 15-per-cluster target =
    20 centroids) and the resulting fit still covers every cluster —
    the shipped SemDeDup scaling rule."""
    cents = similarity.centroids_for_corpus(
        many_clustered, target_cluster_size=15
    )
    assert len(cents) == 20
    rows = {r["vec_id"]: list(r["embedding"]) for r in many_clustered.collect()}
    owners = sorted(
        max(rows, key=lambda i: _cos(rows[i], vec)) % 20 for _, vec, _ in cents
    )
    assert owners == list(range(20))


def test_random_projection_preserves_distances_and_is_deterministic(spark):
    """JL contract on random vectors: projected pairwise distances
    track the originals within the usual JL tolerance at this scale;
    two runs (and a different partitioning) are byte-identical; a new
    seed yields a different projection."""
    import math
    import random as _r

    rng = _r.Random(17)
    D, N, K = 64, 60, 32
    rows = [(i, [rng.gauss(0, 1) for _ in range(D)]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    proj = {
        r["vec_id"]: list(r["projected"])
        for r in similarity.random_projection(df, K).collect()
    }
    assert all(len(v) == K for v in proj.values())
    orig = {i: v for i, v in rows}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    pairs = [(i, j) for i in range(0, 20) for j in range(i + 1, 20)]
    for i, j in pairs:
        d0 = dist(orig[i], orig[j])
        d1 = dist(proj[i], proj[j])
        ratios.append(d1 / d0)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2
    assert max(ratios) < 1.8 and min(ratios) > 0.45

    again = {
        r["vec_id"]: list(r["projected"])
        for r in similarity.random_projection(
            df.repartition(7), 32
        ).collect()
    }
    assert again == proj
    other = {
        r["vec_id"]: list(r["projected"])
        for r in similarity.random_projection(df, 32, seed=7).collect()
    }
    assert other != proj


def test_random_projection_plan_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        similarity.random_projection(df, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    import pytest as _p

    with _p.raises(ValueError):
        similarity.random_projection(df, 0)


def test_centroid_similarity_scores_match_numpy_and_duckdb(spark):
    """Embedding-centroid quality gate: scores equal a numpy
    re-derivation AND an independent DuckDB SQL twin at 9 dp; seeds
    score highest on clustered data; NULL/odd-width rows score NULL;
    empty seed set raises; the scoring plan is a zero-shuffle
    projection with no Python nodes."""
    import numpy as np

    rng = random.Random(11)
    good = [[1.0 + rng.gauss(0, 0.05) for _ in range(8)] for _ in range(20)]
    bad = [[-1.0 + rng.gauss(0, 0.05) for _ in range(8)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(good + bad)]
    rows.append((98, None))
    rows.append((99, [1.0, 2.0]))  # wrong width
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = similarity.centroid_similarity_scores(
        df, F.col("vec_id") < 10  # first 10 good rows are the seed
    )
    got = {r["vec_id"]: r["centroid_cos"] for r in out.collect()}
    assert got[98] is None and got[99] is None

    # numpy twin (centroid = exact mean of the seed rows)
    c = np.mean(np.array(good[:10]), axis=0)
    for i, v in enumerate(good + bad):
        vv = np.array(v)
        want = round(float(vv @ c / (np.linalg.norm(vv) * np.linalg.norm(c))), 9)
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)

    # seeds/good cluster scores near 1, opposite cluster near -1
    assert min(got[i] for i in range(40) if i < 20) > 0.99
    assert max(got[i] for i in range(20, 40)) < -0.99

    # independent DuckDB twin over the same literal rows
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, {list(v)})" for i, v in enumerate(good + bad)
    )
    duck = {
        r[0]: round(r[1], 9)
        for r in con.execute(f"""
            WITH e(vec_id, v) AS (VALUES {vals}),
            c AS (
              SELECT list(a ORDER BY t) AS cv FROM (
                SELECT t, AVG(e.v[t]) AS a
                FROM e, UNNEST(generate_series(1, 8)) AS g(t)
                WHERE e.vec_id < 10
                GROUP BY t
              )
            )
            SELECT e.vec_id,
                   list_sum(list_transform(generate_series(1, 8),
                       t -> e.v[t] * c.cv[t]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
                      * sqrt(list_sum(list_transform(c.cv, x -> x*x))))
            FROM e, c
        """).fetchall()
    }
    for i in range(40):
        assert abs(got[i] - duck[i]) < 2e-9, (i, got[i], duck[i])

    # scoring plan: no exchange, no Python (the centroid is a literal)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    import pytest as _p

    with _p.raises(ValueError):
        similarity.centroid_similarity_scores(df, F.col("vec_id") < 0)


def test_centroid_similarity_null_elements_and_width_majority(spark):
    """Hardening (r9 review findings): a seed row carrying NULL
    elements is EXCLUDED from the fit (a NULL-skipping sum over the
    full row count would silently bias the centroid); corpus rows with
    NULL elements score NULL; dim inference takes the MAJORITY seed
    width, so one malformed seed row cannot nondeterministically evict
    the real seeds."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [1.0, None]),     # seed with NULL element: excluded
        (3, [9.9]),           # malformed width: must not set d
        (10, [0.0, 1.0]),
        (11, [1.0, None]),    # corpus NULL element: scores NULL
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["centroid_cos"]
        for r in similarity.centroid_similarity_scores(
            df, F.col("vec_id") < 10
        ).collect()
    }
    # centroid = mean of rows 0,1 only = [1, 0]; row 2's NULL excluded
    assert out[0] == 1.0 and out[1] == 1.0
    assert out[10] == 0.0
    assert out[2] is None and out[11] is None  # NULL elements -> NULL
    assert out[3] is None                      # off-width -> NULL

    # all-NULL-element seed set raises, not TypeError
    import pytest as _p

    nul = spark.createDataFrame(
        [(1, [None, None])], "vec_id long, embedding array<double>"
    )
    with _p.raises(ValueError):
        similarity.centroid_similarity_scores(nul, F.col("vec_id") == 1)


def test_degenerate_vector_guards_r11(spark):
    """r11 review hardening across the module: zero-norm/NULL vectors
    cannot become pivots (kcenter used to pick every zero vector FIRST
    — its NULL cosine left best=-2.0 forever — then crash float() on a
    NULL vector; ivf_centroids crashed on NULL and stored a 0.0 norm
    that divided by zero downstream); random_projection keeps
    NULL/empty rows with NULL output instead of dropping them;
    brute_force_topk refuses an unrestricted n² plan past max_pairs;
    hyperplane_sketches caps planes at 63; _nearest_centroids refuses
    an empty centroid list at call time."""
    import pytest

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]),        # cluster A
        (2, [0.0, 1.0]), (3, [0.1, 0.9]),        # cluster B
        (10, [0.0, 0.0]),                        # zero vector
        (11, None),                              # NULL vector
        (12, [1.0, None]),                       # NULL element
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # kcenter: pivots come only from the four real vectors
    pivots = similarity.kcenter_centroids(df, n_centroids=3)
    assert len(pivots) == 3 and all(n > 0 for _, _, n in pivots)

    # ivf: no crash, no zero-norm pivot
    cents = similarity.ivf_centroids(df, n_centroids=4)
    assert len(cents) == 4 and all(n > 0 for _, _, n in cents)

    # random_projection: every input id survives; degenerate rows NULL
    proj = {
        r["vec_id"]: r["projected"]
        for r in similarity.random_projection(df, 2).collect()
    }
    assert set(proj) == {0, 1, 2, 3, 10, 11, 12}
    assert proj[11] is None          # NULL vector -> NULL projection
    assert proj[0] is not None and len(proj[0]) == 2

    # brute-force fuse: unrestricted n^2 refused past the bound
    with pytest.raises(ValueError, match="max_pairs"):
        similarity.brute_force_topk(df, max_pairs=10)
    # restricted query side passes under the same bound
    similarity.brute_force_topk(df.filter("embedding is not null"),
                                query_ids=[0], max_pairs=10).collect()

    # planes ceiling: bit 63 is the sign bit
    with pytest.raises(ValueError, match="planes"):
        similarity.hyperplane_sketches(df, planes=64)

    # empty centroid list refused at call time, not mid-execution
    with pytest.raises(ValueError, match="non-empty"):
        similarity._nearest_centroids(
            df.selectExpr("vec_id as id", "embedding as v"), [], 1, "id", "v"
        )


# ---------------------------------------------------------------------------
# Incremental embedding near-dup (r13): batch vs persisted sketch index
# ---------------------------------------------------------------------------


def _split_batch(df, pred):
    return df.filter(pred), df.filter(~pred)


def test_lsh_incremental_equals_new_involving_subset(spark, vectors):
    """The defining invariant (same as every other incremental dedup
    family): the incremental run over (batch, persisted index) returns
    exactly the batch-involving subset of the full-corpus run — here at
    threshold -1 so the CANDIDATE sets themselves are compared, not
    just the verified survivors."""
    df, _ = vectors
    pred = (F.col("vec_id") % 4 == 0) | (F.col("vec_id") >= 100)
    batch, index = _split_batch(df, pred)
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}

    full = similarity.lsh_neardup_pairs(
        df, threshold=-1.0, planes=4, rotations=2
    ).collect()
    want = {
        (frozenset((r["id1"], r["id2"])), r["cosine"])
        for r in full
        if r["id1"] in batch_ids or r["id2"] in batch_ids
    }

    idx_sk = similarity.hyperplane_sketches(index, planes=4, rotations=2)
    pairs, updated = similarity.lsh_neardup_incremental(
        batch, idx_sk, index, threshold=-1.0, planes=4, rotations=2
    )
    got = pairs.collect()
    assert {
        (frozenset((r["id1"], r["id2"])), r["cosine"]) for r in got
    } == want
    # orientation contract: id1 is ALWAYS a batch doc; within-batch
    # pairs additionally keep id1 < id2
    for r in got:
        assert r["id1"] in batch_ids
        if r["id2"] in batch_ids:
            assert r["id1"] < r["id2"]
    # updated_sketches is tomorrow's index: exactly the full-corpus
    # sketch set (deterministic hyperplanes — no stored model)
    full_sk = sorted(
        tuple(r)
        for r in similarity.hyperplane_sketches(
            df, planes=4, rotations=2
        ).collect()
    )
    assert sorted(tuple(r) for r in updated.collect()) == full_sk


def test_lsh_incremental_recalls_planted_against_index(spark, vectors):
    """The production case: planted near-dups arrive as the daily
    batch, their sources sit in the persisted index — every planted
    pair is found, oriented (new, old), and nothing else survives the
    strict verify."""
    df, _ = vectors
    batch, index = _split_batch(df, F.col("vec_id") >= 100)
    idx_sk = similarity.hyperplane_sketches(index, planes=8)
    pairs, _ = similarity.lsh_neardup_incremental(
        batch, idx_sk, index, threshold=0.99, planes=8
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert got == {(100, 0), (101, 1), (102, 2)}


def test_lsh_incremental_cap_matches_full_run_cap(spark, vectors):
    """Hot-bucket cap parity: the cap counts the COMBINED batch ∪
    index population per (rot, bucket) — exactly the full run's
    counts — so capped runs agree pair-for-pair too (planes=2 makes
    every bucket hot at max_bucket=8, exercising real drops)."""
    df, _ = vectors
    pred = F.col("vec_id") % 3 == 0
    batch, index = _split_batch(df, pred)
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}

    full = similarity.lsh_neardup_pairs(
        df, threshold=-1.0, planes=2, max_bucket=8
    ).collect()
    want = {
        frozenset((r["id1"], r["id2"]))
        for r in full
        if r["id1"] in batch_ids or r["id2"] in batch_ids
    }
    idx_sk = similarity.hyperplane_sketches(index, planes=2)
    pairs, _ = similarity.lsh_neardup_incremental(
        batch, idx_sk, index, threshold=-1.0, planes=2, max_bucket=8
    )
    got = {frozenset((r["id1"], r["id2"])) for r in pairs.collect()}
    assert got == want
    # and the cap actually bit: the uncapped run finds strictly more
    uncapped = similarity.lsh_neardup_pairs(
        df, threshold=-1.0, planes=2
    ).count()
    assert uncapped > len(full)


def test_lsh_incremental_randomized_differential(spark):
    """Randomized differential x3 (the incremental-operator pattern:
    CC merge x4, keepers x5): random corpora, random batch splits,
    random layouts — the incremental run must equal the new-involving
    subset of the full run every time, including verified cosines."""
    import random as _r

    for trial in range(3):
        rng = _r.Random(1000 + trial)
        n = rng.randint(20, 40)
        vecs = {
            i: [rng.gauss(0, 1) for _ in range(DIM)] for i in range(n)
        }
        # plant a few near-dups of random sources
        for j in range(rng.randint(1, 4)):
            src = rng.randrange(n)
            vecs[200 + j] = [x + rng.gauss(0, 0.02) for x in vecs[src]]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        frac = rng.choice((2, 3, 4))
        pred = F.col("vec_id") % frac == 0
        batch, index = df.filter(pred), df.filter(~pred)
        batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
        planes = rng.choice((4, 6, 8))
        rots = rng.choice((1, 2))
        thr = rng.choice((-1.0, 0.9))

        full = similarity.lsh_neardup_pairs(
            df, threshold=thr, planes=planes, rotations=rots
        ).collect()
        want = {
            (frozenset((r["id1"], r["id2"])), r["cosine"])
            for r in full
            if r["id1"] in batch_ids or r["id2"] in batch_ids
        }
        idx_sk = similarity.hyperplane_sketches(
            index, planes=planes, rotations=rots
        )
        pairs, _ = similarity.lsh_neardup_incremental(
            batch, idx_sk, index,
            threshold=thr, planes=planes, rotations=rots,
        )
        got = {
            (frozenset((r["id1"], r["id2"])), r["cosine"])
            for r in pairs.collect()
        }
        assert got == want, (trial, planes, rots, thr, frac)
