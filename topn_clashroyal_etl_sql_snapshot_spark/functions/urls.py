"""URL hygiene for web-crawl curation: host extraction, tracking-param
stripping, and label-boundary domain blocklists.

No reference analog (the reference's only URLs are its two fixed API
endpoints, scripts/etl_snapshot_topn.py:58-76); this is the
crawl-curation slice of the training-pipeline extension mandate — C4,
RefinedWeb and Dolma all gate on URL lists and normalize URLs before
per-domain statistics, and a URL column is how a web corpus names its
groups (per-domain caps, per-domain mixtures, domain dedup).

Everything is codegen column algebra (regexp + string ops — no
urllib, no UDF), deliberately mirrorable in DuckDB SQL (same regex
classes) so URL-keyed queries stay oracle-able. The blocklist matcher
is RELATIONAL on purpose: hosts explode into their suffix chain
(``a.b.co`` → ``a.b.co``, ``b.co``, ``co``) and a broadcast semi/anti
join against the list does exact LABEL-BOUNDARY matching —
``ads.tracker.com`` matches a ``tracker.com`` entry, ``nottracker.com``
does not (the substring/`endswith` shortcut gets this wrong), and the
corpus side never shuffles."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme (optional) → userinfo@ (optional) → HOST (until :port / path /
# query / fragment). Character classes are ASCII-explicit so a DuckDB
# oracle can run the identical pattern.
_HOST_RE = r"^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"

# the tracking params every major pipeline strips (utm_* family plus
# the click-id params). ANCHORED to the [?&] delimiter (captured and
# kept by the replacement) so a non-tracking param whose NAME merely
# ends with a tracking name — ``notutm_source=a``, ``myfbclid=2`` —
# is never corrupted (review finding: the unanchored form matched the
# embedded substring and invented bogus params).
_TRACKING_RE = (
    r"([?&])(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)=[^&#]*"
)


def url_host(col: Column) -> Column:
    """Lowercased host of a URL-ish string (scheme and userinfo
    optional, port/path/query/fragment stripped, trailing dot removed).
    Strings with no host-like prefix yield NULL, not garbage — a
    blocklist that silently never matches is worse than a NULL gate."""
    host = F.regexp_extract(F.lower(F.trim(col)), _HOST_RE, 1)
    host = F.regexp_replace(host, r"\.$", "")
    return F.when(host != "", host)


def registered_domain(col: Column, n_labels: int = 2) -> Column:
    """The last ``n_labels`` host labels (``ads.tracker.co.uk`` → 2 →
    ``co.uk``; → 3 → ``tracker.co.uk``). A HEURISTIC grouping key, not
    public-suffix-list truth (the PSL is a large mutable dataset — out
    of stdlib scope); per-domain caps and mixtures need a stable
    grouping key more than registrar-exact boundaries. For list
    MATCHING use :func:`filter_by_domain_blocklist`, which needs no
    suffix guessing at all."""
    if n_labels < 1:
        raise ValueError(f"n_labels must be ≥ 1, got {n_labels}")
    labels = F.split(url_host(col), r"\.")
    n = F.size(labels)
    return F.when(
        n >= 1,
        F.array_join(
            F.slice(labels, F.greatest(n - (n_labels - 1), F.lit(1)), n_labels),
            ".",
        ),
    )


def strip_tracking_params(col: Column) -> Column:
    """Remove utm_*/click-id query parameters, then normalize the
    leftover separators (``?&`` → ``?``, trailing ``?``/``&`` dropped).
    Fragment and every non-tracking param survive byte-for-byte."""
    c = F.regexp_replace(col, _TRACKING_RE, "$1")
    c = F.regexp_replace(c, r"([?&])&+", "$1")
    c = F.regexp_replace(c, r"\?&", "?")
    return F.regexp_replace(c, r"[?&]+(#|$)", "$1")


def url_normalize(col: Column) -> Column:
    """Canonical URL for dedup/grouping: scheme + host lowercased
    (path/query case PRESERVED — paths are case-significant), default
    ports dropped, tracking params stripped, fragment removed,
    trailing slash on a bare host-path removed. Pure regexp chain —
    one codegen projection.

    Scheme-less and protocol-relative forms (``Example.COM/x``,
    ``//Example.COM/x``) lowercase their host prefix too, matching
    what :func:`url_host` extracts — without this, the schemed and
    scheme-less spellings of one URL produced distinct canonical keys
    (r7 ADVICE). Default-port stripping stays schemed-only: with no
    scheme there is no fact of the matter about which port is
    default."""
    c = F.trim(col)
    # lowercase the <scheme://|//|(bare)>host[:port] prefix only —
    # everything before the first /?#, like _HOST_RE's host scan
    prefix = F.regexp_extract(
        c, r"^((?:[a-zA-Z][a-zA-Z0-9+.-]*://|//)?[^/?#]*)", 1
    )
    # substring via length arithmetic keeps this join-free and codegen
    rest = F.substring(c, F.length(prefix) + 1, F.lit(1 << 30))
    c = F.concat(F.lower(prefix), rest)
    # scheme-SPECIFIC default ports: :443 is NOT default for http (nor
    # :80 for https) — a combined https?/80|443 rule would conflate two
    # distinct origins into one canonical URL (review finding)
    c = F.regexp_replace(c, r"^(http://[^/:?#]+):80(?=[/?#]|$)", "$1")
    c = F.regexp_replace(c, r"^(https://[^/:?#]+):443(?=[/?#]|$)", "$1")
    c = strip_tracking_params(c)
    c = F.regexp_replace(c, r"#.*$", "")
    return F.regexp_replace(
        c, r"^((?:[a-z][a-z0-9+.-]*://|//)?[^/?#]+)/$", "$1"
    )


def host_suffixes(col: Column, max_labels: int = 6) -> Column:
    """Array of the host's label-boundary suffixes, most-specific
    first: ``a.b.co`` → [``a.b.co``, ``b.co``, ``co``], capped at
    ``max_labels`` deep (blocklist entries are 2-4 labels; the cap
    bounds the explode fan-out per row)."""
    labels = F.split(url_host(col), r"\.")
    n = F.size(labels)
    first = F.greatest(n - (max_labels - 1), F.lit(1))
    idx = F.when(n >= 1, F.sequence(first, n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.array_join(F.slice(labels, i, n - i + 1), ".")
    )


def filter_by_domain_blocklist(
    df: DataFrame,
    domains: Iterable[str],
    url_col: str = "url",
    id_col: str = "doc_id",
    keep_matches: bool = False,
    max_labels: int = 6,
) -> DataFrame:
    """Drop (or with ``keep_matches=True``, keep only) rows whose URL
    host falls under any blocklist domain, at exact label boundaries.

    Plan: hosts explode into ≤ ``max_labels`` suffixes → semi-join a
    BROADCAST domain table → anti/semi back on the row id. The corpus
    never shuffles; list size is bounded (curation blocklists are
    10³-10⁶ entries — broadcast territory); matching is a hash probe
    per suffix, so hot domains cost nothing extra. NULL/unparseable
    URLs produce no suffixes and therefore never match — they PASS a
    blocklist (gate them separately if a parseable URL is required)."""
    spark = df.sparkSession
    dlist = [d.strip().lower().lstrip(".") for d in domains if d and d.strip()]
    if not dlist:
        return df if not keep_matches else df.limit(0)
    dtab = F.broadcast(
        spark.createDataFrame([(d,) for d in sorted(set(dlist))], "suffix string")
    )
    sufs = df.select(
        F.col(id_col).alias("_bid"),
        F.explode(host_suffixes(F.col(url_col), max_labels)).alias("suffix"),
    )
    matched = sufs.join(dtab, "suffix", "left_semi").select("_bid").distinct()
    how = "left_semi" if keep_matches else "left_anti"
    return df.join(matched, df[id_col] == matched["_bid"], how)
