"""Cross-document overlap beyond whole-document similarity: repeated-
substring detection and asymmetric containment.

Whole-document Jaccard (``dedup.jaccard_pairs``) misses the two
overlap shapes that matter most in web corpora:

- a SHARED PARAGRAPH inside otherwise-different documents (license
  boilerplate, quoted articles, templated footers) — global Jaccard
  is low even though hundreds of tokens match verbatim;
- CONTAINMENT — a short document embedded whole inside a long one
  (the article vs the article+comments page) — Jaccard is bounded by
  len(short)/len(long) however perfect the inclusion.

Two operators, both inverted-index joins (no pairwise scan):

- :func:`winnow_overlap_pairs` — document pairs sharing selected
  winnowing fingerprints (``textstats.winnow_marked``, the MOSS
  scheme). The winnowing guarantee transfers: ANY verbatim run of
  ``window + k - 1`` tokens shared by two documents yields ≥ 1 shared
  selected fingerprint, so recall for paragraph-sized copies is
  structural, not probabilistic — at ~2/(window+1) the fingerprint
  density (and hence index size) is a tunable fraction of the corpus.
- :func:`containment_pairs` — exact n-gram containment
  ``|A∩B| / min(|A|,|B|)`` over the same hashed postings the Jaccard
  family uses (shareable ``toks``), reported alongside Jaccard so the
  caller sees both global and asymmetric similarity.

Scale: both follow the dedup family's inverted-index discipline —
``max_df`` drops fingerprints/shingles whose document frequency says
"boilerplate" (quadratic candidate blowup, no pair-level signal;
the COUNT of dropped keys is reported by the caller's profiling, not
silently hidden — the df cap is part of the operator contract), joins
shuffle on high-cardinality hash keys, candidate verification is
integer counting. No all-pairs plan is reachable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from .textstats import winnow_marked


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    min_shared: int = 1,
    max_df: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id1, id2, n_shared, n_fp1, n_fp2, overlap1, overlap2) for
    document pairs sharing ≥ ``min_shared`` distinct selected
    fingerprints; ``overlap_i = n_shared / n_fp_i`` estimates the
    fraction of document i covered by material shared with the other
    side (the MOSS similarity display). A pair sharing one
    paragraph of ``window + k - 1`` tokens is GUARANTEED to appear."""
    # the selected set is the DISTINCT window minima — the pre-r11
    # h==wmin rule missed the shared fingerprint on 37% of pairs
    # overlapping by exactly window+k-1 tokens (the guarantee
    # boundary; see winnow_marked)
    sel = (
        winnow_marked(docs, k, window, text_col, id_col)
        .select("id", F.col("wmin").alias("h"))
        .distinct()
    )
    sel = sel.localCheckpoint(eager=False)  # sizes + both join sides
    if max_df is not None:
        df_counts = sel.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
        sel = sel.join(df_counts.filter(F.col("_df") <= max_df), "h", "left_semi")
    sizes = sel.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = sel.select(F.col("id").alias("id1"), "h")
    b = sel.select(F.col("id").alias("id2"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.withColumnsRenamed({"id": "id1", "n_fp": "n_fp1"}), "id1")
        .join(sizes.withColumnsRenamed({"id": "id2", "n_fp": "n_fp2"}), "id2")
        .select(
            "id1",
            "id2",
            "n_shared",
            "n_fp1",
            "n_fp2",
            (F.col("n_shared").cast("double") / F.col("n_fp1")).alias("overlap1"),
            (F.col("n_shared").cast("double") / F.col("n_fp2")).alias("overlap2"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """(id1, id2, n_common, n1, n2, containment, jaccard) where
    ``containment = n_common / min(n1, n2)`` — 1.0 means the smaller
    document's n-gram set is entirely inside the larger's, however
    different their sizes (the case Jaccard structurally cannot
    reach). Pairs at ``containment ≥ threshold``; pass ``toks`` to
    share the dedup family's tokenize scan."""
    postings = dedup.hashed_postings(docs, text_col, id_col, n, toks=toks)
    if max_df is not None:
        df_counts = postings.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        postings = postings.join(
            df_counts.filter(F.col("_df") <= max_df), "sh", "left_semi"
        )
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = postings.select(F.col("id").alias("id1"), "sh")
    b = postings.select(F.col("id").alias("id2"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id1", "n_sh": "n1"}), "id1")
        .join(sizes.withColumnsRenamed({"id": "id2", "n_sh": "n2"}), "id2")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least(F.col("n1"), F.col("n2")),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_common")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id1", "id2", "n_common", "n1", "n2", "containment", "jaccard")
    )
