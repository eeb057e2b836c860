"""Byte-level BPE tokenization as a corpus stage: train on a sample,
encode the corpus, feed REAL token counts to sequence packing.

``functions/text.py::bpe_pretokens`` stops at pre-tokenization (the
counting proxy); this module finishes the job — the merge loop that
turns pre-token bytes into vocabulary ids (the GPT-2 byte-level BPE
scheme, public: openai/gpt-2 ``encoder.py`` and Sennrich et al. 2016).
No reference analog; training-pipeline extension mandate.

Design for scale:

- **Training is a driver-side fit on a deterministic sample**
  (:func:`train_bpe_sampled`): tokenizer fitting is a
  small-fixed-sample operation in real pipelines (a vocab trained on
  ~10⁵ documents is indistinguishable from one trained on 10¹⁰ for
  budget purposes) — the sample is drawn with the same xxhash64 bucket
  math as ``operators/sampling.py`` (replayable, append-stable), and
  the documented-smallness collect matches the IVF-pivot/catalog-map
  exceptions. This is NOT a distributed trainer; it deliberately
  refuses absurd sample sizes rather than melt the driver.
- **Encoding is the distributed stage** (:func:`bpe_encode_text`):
  the ranked merges table (a few 10⁴ entries — vocab-sized, KBs to a
  few MB) ships to every executor via a Spark BROADCAST variable, and
  the merge loop runs in an Arrow-batched ``mapInPandas`` with an
  LRU word cache (Zipf: a few thousand distinct words cover most of a
  natural-language corpus, so the per-word loop amortizes to a dict
  hit). Per-row CPU, no shuffle — the same legitimate-Python shape as
  the multimodal decoders.

Vocabulary convention: ids 0..255 are the raw bytes; id 256+i is the
output of merge i. Decoding is therefore table-free
(:func:`decode_ids`), and ``b"".join(decode) == text.encode()`` holds
for EVERY input — the round-trip invariant the tests pin.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Python-re rendering of functions/text.py::BPE_PRETOKEN_PATTERN
# (\p{L} → [^\W\d_], \p{N} → \d, punct class keeps "_"). The
# alternation covers every character class, and re.findall returns
# non-overlapping left-to-right matches, so the concatenation of
# pre-tokens reproduces the input exactly (the GPT-2 property the
# round-trip invariant relies on).
_PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+"
)


def pretokenize(text: str) -> list[bytes]:
    return [t.encode("utf-8") for t in _PRETOKEN_RE.findall(text)]


def _get_pairs(parts: list[bytes]) -> set[tuple[bytes, bytes]]:
    return {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}


def encode_word(word: bytes, ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """Canonical GPT-2 merge loop: repeatedly merge every occurrence of
    the lowest-ranked adjacent pair until none remains."""
    parts = [word[i : i + 1] for i in range(len(word))]
    while len(parts) > 1:
        pairs = _get_pairs(parts)
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        first, second = best
        out: list[bytes] = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == first and parts[i + 1] == second:
                out.append(first + second)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def train_bpe(word_freqs: dict[bytes, int], n_merges: int) -> list[tuple[bytes, bytes]]:
    """Pure-Python BPE training over a word-frequency table: each round
    merges the globally most frequent adjacent pair (ties broken
    lexicographically — deterministic across runs/platforms)."""
    splits = {w: [w[i : i + 1] for i in range(len(w))] for w in word_freqs}
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        counts: dict[tuple[bytes, bytes], int] = {}
        for w, parts in splits.items():
            f = word_freqs[w]
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        first, second = best
        for w, parts in splits.items():
            if len(parts) < 2:
                continue
            out: list[bytes] = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] == first
                    and parts[i + 1] == second
                ):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            splits[w] = out
    return merges


def train_bpe_sampled(
    docs: DataFrame,
    n_merges: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float = 1.0,
    max_docs: int = 100_000,
) -> list[tuple[bytes, bytes]]:
    """Fit BPE merges on a deterministic hash-sample of the corpus.

    Sample membership is ``sampling.hash_sample`` itself — not a
    re-implementation — so the tokenizer's training sample lives in
    the SAME bucket space as ``with_split``/``hash_sample`` holdouts
    (a hand-rolled ``xxhash64(id)`` would bucket every key differently
    from ``bucket_expr``'s seeded ``xxhash64(42L, id)`` chain and
    silently break any nesting/alignment assumption). The collect is
    bounded by ``max_docs``: a tokenizer fit needs a fixed-size
    sample, not the corpus — exceeding the bound raises rather than
    melting the driver (same fuse philosophy as
    ``brute_force_neardup_pairs``)."""
    from .sampling import hash_sample

    s = docs
    if sample_fraction < 1.0:
        s = hash_sample(docs, id_col, sample_fraction)
    s = s.select(F.col(text_col).alias("t"))
    n = s.count()
    if n > max_docs:
        raise ValueError(
            f"train_bpe_sampled refuses to collect {n} documents "
            f"(> max_docs={max_docs}); lower sample_fraction — a BPE fit "
            "does not improve past a fixed-size sample."
        )
    freqs: dict[bytes, int] = {}
    for r in s.collect():
        if r["t"] is None:
            continue
        for w in pretokenize(r["t"]):
            freqs[w] = freqs.get(w, 0) + 1
    return train_bpe(freqs, n_merges)


def vocab_from_merges(merges: list[tuple[bytes, bytes]]) -> dict[bytes, int]:
    """token-bytes → id. Ids 0..255 are raw bytes; 256+i is merge i's
    output. Every token ``encode_word`` can emit is covered: a merge
    output exists for each rank, and unmerged parts are single bytes."""
    vocab = {bytes([b]): b for b in range(256)}
    for i, (a, b) in enumerate(merges):
        vocab[a + b] = 256 + i
    return vocab


def encode_text(text: str, ranks, vocab) -> list[int]:
    return [
        vocab[part]
        for w in pretokenize(text)
        for part in encode_word(w, ranks)
    ]


def decode_ids(ids: list[int], merges: list[tuple[bytes, bytes]]) -> bytes:
    """Decode via the vocabulary convention (merge sides are stored as
    full byte strings, so merge i's token is simply their
    concatenation)."""
    toks = [bytes([b]) for b in range(256)] + [a + b for a, b in merges]
    return b"".join(toks[i] for i in ids)


def bpe_encode_text(
    docs: DataFrame,
    merges: list[tuple[bytes, bytes]],
    text_col: str = "text",
    ids_col: str = "token_ids",
    count_col: str = "n_tokens",
    cache_size: int = 65_536,
    max_word_bytes: int = 1024,
) -> DataFrame:
    """Adds ``ids_col`` (array<int> of BPE vocabulary ids) and
    ``count_col`` (their count — the REAL token budget for
    ``packing.pack_greedy``/``pack_ffd``) to every row. NULL text →
    NULL ids / NULL count.

    The merges table rides a Spark broadcast variable (one copy per
    executor, not per task); the per-word merge loop memoizes through
    an LRU cache sized for the Zipf head. Arrow-batched ``mapInPandas``
    over existing columns — no shuffle, embarrassingly parallel.

    ``max_word_bytes`` is the per-pre-token fuse (the same bounded-
    per-row discipline as the media decoders' ``max_bytes``):
    ``encode_word`` is O(L²) in pre-token length, so a single space-
    free megabyte run (a base64/minified-JS blob in a web crawl) would
    otherwise pin one executor core for hours. Longer pre-tokens are
    split into ``max_word_bytes`` segments encoded independently —
    the round-trip invariant is untouched (segment byte decompositions
    concatenate back to the word; only merges ACROSS the cut are lost,
    which for binary blobs don't exist in a text-trained vocab anyway)
    — and bypass the LRU cache (unique blobs would evict the Zipf
    head). Natural-language pre-tokens are tens of bytes; 1024 only
    ever fires on machine-generated runs."""
    from functools import lru_cache

    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(merges)
    kept = [f for f in docs.schema if f.name not in (ids_col, count_col)]
    schema = T.StructType(
        kept
        + [
            T.StructField(ids_col, T.ArrayType(T.IntegerType()), True),
            T.StructField(count_col, T.IntegerType(), True),
        ]
    )
    kept_names = [f.name for f in kept]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mg = bc.value
        ranks = {pair: i for i, pair in enumerate(mg)}
        vocab = vocab_from_merges(mg)

        @lru_cache(maxsize=cache_size)
        def word_ids(w: bytes) -> tuple[int, ...]:
            return tuple(vocab[p] for p in encode_word(w, ranks))

        def ids_for(w: bytes) -> tuple[int, ...]:
            if len(w) <= max_word_bytes:
                return word_ids(w)
            return tuple(
                vocab[p]
                for s in range(0, len(w), max_word_bytes)
                for p in encode_word(w[s : s + max_word_bytes], ranks)
            )

        for pdf in batches:
            ids_out, n_out = [], []
            for t in pdf[text_col]:
                if t is None:
                    ids_out.append(None)
                    n_out.append(None)
                    continue
                ids = [i for w in pretokenize(t) for i in ids_for(w)]
                ids_out.append(ids)
                n_out.append(len(ids))
            out = pdf[kept_names].copy()
            out[ids_col] = ids_out
            out[count_col] = pd.array(n_out, dtype="Int32")
            yield out

    return docs.mapInPandas(run, schema)
