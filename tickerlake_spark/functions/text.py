"""Text-analysis expression library — pure Spark SQL expressions.

Building blocks for the LLM-data-pipeline operators (dedup, language ID,
quality scoring, fingerprinting). Everything is JVM-side (whole-stage
codegen); there are no Python UDFs, so these run at full scan speed over
100 TB of documents.

Cross-engine portable hashing: ``h60`` maps any string to a 60-bit
non-negative integer via the first 15 hex chars of md5 — DuckDB computes the
identical value with ``CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)``,
which is what makes MinHash/SimHash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "h60",
    "word_shingles",
    "minhash_signature",
    "simhash",
    "MINHASH_PRIME",
    "PUNCT_CLASS",
    "STOPWORDS",
]

# 2^31 - 1 (Mersenne); permutation coefficients stay < 2^31 so
# a * (h % p) + b < 2^62 never overflows a long.
MINHASH_PRIME = 2_147_483_647

# explicit class: locale/unicode-independent, identical regex in DuckDB
PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"

# tiny per-language stopword lexicons for the n-gram/stopword language
# heuristic; enough to separate the corpus languages deterministically
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens. ``regexp_split_to_array(lower(trim(x)),
    '\\s+')`` in the oracle."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(t)), r"\s+")


def h60(s: Column) -> Column:
    """60-bit deterministic string hash (md5 prefix), non-negative long."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Array of word n-gram strings (space-joined), distinct.

    Uses ``array_join(slice(toks, i, n))`` — ONE reference to ``toks`` per
    shingle. The element_at-per-position formulation embeds the tokenizer
    expression n times per shingle, and without CSE through higher-order
    lambdas that re-runs the regex split O(n * |shingles|) times per row
    (measured 6x slower). Callers should still pass ``toks`` as a bound
    attribute (compute it behind an exchange), not an inline expression.

    DuckDB mirror: ``list_distinct(list_transform(range(1, len(t)-n+2),
    i -> t[i] || ' ' || t[i+1] || ...))`` (1-based) — same strings."""
    # guard: Spark's sequence(0, m) runs DESCENDING for m < 0, producing
    # 0-and-negative slice starts that THROW (INVALID_PARAMETER_VALUE.START)
    # — a single sub-n-token doc would crash the whole dedup job. DuckDB's
    # range(1, m) is simply empty there, so the guard also keeps the
    # engines aligned: short docs get an empty shingle set.
    joined = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(joined)


def minhash_signature(shingle_hashes: Column, k: int = 32) -> Column:
    """k-element MinHash signature over a (non-empty) array of h60 hashes.

    perm_j(h) = ((1 + 41 j) * (h mod p) + 7 + 17 j) mod p, p = 2^31 - 1;
    sig[j] = min over shingles. Identical arithmetic in the DuckDB oracle.

    Single-pass formulation: one fold over the hashes computing all k
    permutations per element and taking the elementwise min. The naive
    "transform over k slots, array_min inside" re-evaluates the input
    expression per slot (no CSE through higher-order lambdas) — measured
    13x slower at 260k shingles.

    The permutation coefficients live in ONE literal array of structs and the
    permutation arithmetic in ONE zip_with lambda — an unrolled k-wide
    expression (k copies of the arithmetic) computes identically but costs
    ~8s of Catalyst analysis + codegen per query at k=32, which dominated the
    whole dedup pipeline's first-run latency.
    """
    p = F.lit(MINHASH_PRIME)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), k)
    coefs = F.array(
        *[
            F.struct(
                F.lit(1 + 41 * j).cast("long").alias("a"),
                F.lit(7 + 17 * j).cast("long").alias("b"),
            )
            for j in range(k)
        ]
    )

    return F.aggregate(
        shingle_hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            coefs,
            lambda m, c: F.least(m, (c["a"] * (h % p) + c["b"]) % p),
        ),
    )


def simhash(token_hashes: Column, bits: int = 32) -> Column:
    """SimHash over h60 token hashes: bit b of the output is 1 iff the
    majority of tokens have bit b set. Returns a non-negative long.

    Near-duplicate texts differ in a few tokens -> small Hamming distance
    (compare with bit_count(simhash(a) ^ simhash(b))).
    """
    # Single pass over the hashes: fold an array of per-bit counters
    # (one aggregate referencing the input ONCE), then fold the counters
    # into the hash long via zip_with against the bit-value array — the
    # per-bit-aggregate version re-evaluates token_hashes `bits` times.
    # The per-bit ±1 extraction is ONE transform lambda over a literal
    # powers array (h & 2^b), not a `bits`-wide unrolled expression — see
    # minhash_signature on why tree size dominates first-run latency.
    init = F.array_repeat(F.lit(0).cast("long"), bits)
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])

    def bitvec(h: Column) -> Column:
        return F.transform(
            powers,
            lambda pw: F.when(h.bitwiseAND(pw) != 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long"),
        )

    counters = F.aggregate(
        token_hashes,
        init,
        lambda acc, h: F.zip_with(acc, bitvec(h), lambda a, b: a + b),
    )
    return F.aggregate(
        F.zip_with(
            counters,
            powers,
            lambda c, pw: F.when(c > 0, pw).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
