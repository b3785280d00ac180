"""Text-analysis / document-dedup column builders.

Large-scale training-data pipeline operators over a document/text column,
each expressed as pure JVM-side column expressions (no UDFs) so they stay
inside whole-stage codegen AND remain expressible in ANSI-ish SQL for the
DuckDB cross-check oracle:

  - tokenization + token stats (whitespace/identifier tokens)
  - word k-shingles (the MinHash input of the clone engine, doc-level)
  - portable MinHash via md5 (same function exists in DuckDB, so the
    *identical* sketch is computable by the oracle — unlike xxhash64)
  - LSH band buckets over the md5 MinHash
  - exact dedup via sha2(text)
  - language-ID heuristic (stopword-hit ratio)
  - quality scoring (length / word-length / alpha ratios)
  - character n-gram fingerprinting (min-md5 over char 5-grams —
    a winnowing-style document fingerprint)

The clone pipeline proper uses the faster xxhash64-based sketches in
signatures.py; these md5 variants are the cross-engine-verifiable twins
with identical structure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9_]+"

# Tiny fixed stoplist (shared literal with the SQL oracle).
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


def doc_tokens(text: Column) -> Column:
    """All tokens (with duplicates), lowercased."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def distinct_tokens(text: Column) -> Column:
    return F.array_sort(F.array_distinct(doc_tokens(text)))


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """Sorted distinct k-word shingles joined by single spaces."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))
    return F.array_sort(F.array_distinct(sh))


def minhash_md5(items: Column, k: int = 4) -> Column:
    """k-minimum-values sketch over md5(item) — portable across engines.
    Returns the k smallest md5 hex digests (sorted ascending)."""
    return F.slice(F.array_sort(F.transform(items, lambda t: F.md5(t))), 1, k)


def band_bucket(minhash: Column, band: int = 1) -> Column:
    """An LSH band key: 8-hex prefix of the band-th minhash value.

    ``try_element_at`` (not ``element_at``): a document whose token set is
    empty has an empty ``minhash_md5`` sketch, and Spark 4's default ANSI
    mode turns the out-of-bounds ``element_at`` into a runtime
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash. The NULL bucket this returns
    instead mirrors the SQL oracle exactly (DuckDB ``list[1]`` on an empty
    list is NULL), so empty-token docs group under a NULL bucket on both
    engines."""
    return F.substring(F.try_element_at(minhash, F.lit(band)), 1, 8)


def stopword_ratio(tokens: Column) -> Column:
    hits = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(tokens) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(tokens).cast("double")
    )


def mean_token_len(tokens: Column) -> Column:
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tokens) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(tokens).cast("double")
    )


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ascii letters or space."""
    stripped = F.regexp_replace(text, "[^A-Za-z ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(text).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, ~1]: rewards mid-length docs,
    plausible word lengths, high alpha ratio. Deterministic arithmetic
    only (cross-engine reproducible)."""
    toks = doc_tokens(text)
    len_score = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    wl = mean_token_len(toks)
    wl_score = F.when((wl >= 3.0) & (wl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + wl_score + alpha_ratio(text)) / F.lit(3.0), 6)


def lang_guess(tokens: Column, threshold: float = 0.05) -> Column:
    """Stopword-ratio language-ID heuristic: 'en' iff the stopword hit
    ratio clears the threshold."""
    return F.when(stopword_ratio(tokens) >= F.lit(threshold), F.lit("en")).otherwise(
        F.lit("unk")
    )


def char_ngrams(text: Column, n: int = 5) -> Column:
    ln = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.substring(text, i, n))


def fingerprint_min_md5(text: Column, n: int = 5) -> Column:
    """Winnowing-style document fingerprint: minimum md5 over character
    n-grams; null for texts shorter than n."""
    grams = char_ngrams(text, n)
    return F.when(F.size(grams) == 0, F.lit(None)).otherwise(
        F.array_min(F.transform(grams, lambda g: F.md5(g)))
    )


def jaccard_sets(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) array columns."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def kmv_jaccard_est(ma: Column, mb: Column, k: int = 8) -> Column:
    """Jaccard estimate from two k-minimum-values sketches (minhash_md5
    columns): take the k smallest values of the sketch union, count how
    many appear in both sketches. Standard KMV estimator — converges to
    the exact Jaccard as k grows; portable to the SQL oracle because the
    sketch is md5-based."""
    u = F.slice(F.array_sort(F.array_union(ma, mb)), 1, k)
    inter = F.size(
        F.filter(u, lambda x: F.array_contains(ma, x) & F.array_contains(mb, x))
    )
    return F.when(F.size(u) == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / F.size(u).cast("double")
    )


def simhash16(df, id_col: str, text_col: str):
    """16-bit SimHash per row, computed with JVM-side explode + groupBy
    (codegen throughout — scale path is a plain aggregation on the id).

    The bit source is the first 4 hex chars of md5(token) so the *same*
    fingerprint is computable by the DuckDB oracle; the clone pipeline's
    internal 64-bit SimHash (signatures.simhash_vector) is the xxhash64
    fast twin of this construction. Majority vote per bit, ties -> clear;
    empty token sets get simhash16 = 0.
    """
    toks = df.select(id_col, F.explode(distinct_tokens(F.col(text_col))).alias("t"))
    v = F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(v, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    val: Column = F.lit(0)
    for j in range(16):
        val = val + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return (
        df.select(id_col)
        .join(votes, id_col, "left")
        .select(id_col, F.coalesce(val, F.lit(0)).cast("long").alias("simhash16"))
    )
