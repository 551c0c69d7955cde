"""Deduplication operators.

Exact and near-duplicate detection designed for 100 TB document corpora:
everything is a shuffle-on-key or a bucketed self-join — no driver collects,
no pairwise O(n^2) over the full corpus.

- ``dedup_keep_last``/``dedup_keep_first``: the reference's
  ``unique(subset, keep='last')`` (reference: bronze/splits.py:45) made
  deterministic with an explicit arrival order.
- ``exact_dedup``: content-hash groupBy (md5) — one shuffle on the hash.
- near-dup families (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
  live here too; each emits candidate pairs or a keep/drop marking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dedup_keep_last",
    "dedup_keep_first",
    "exact_dedup",
    "signature_table",
    "band_keys",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "embedding_neardup_pairs",
]


def _ranked(df: DataFrame, keys: list[str], order_by: list[str], desc: bool) -> DataFrame:
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dedup_keep_last(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep the last row per key under ``order_by`` (ties broken by the full
    order list — callers must pass a total order for determinism)."""
    return _ranked(df, keys, order_by, desc=True)


def dedup_keep_first(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep the first row per key under ``order_by``."""
    return _ranked(df, keys, order_by, desc=False)


def exact_dedup(
    df: DataFrame,
    content_col: str,
    id_col: str,
    normalize: Column | None = None,
) -> DataFrame:
    """Exact-content dedup: md5 the (optionally normalized) content, keep the
    lowest id per hash. Scales as a single hash-shuffle; the hash column is
    64x smaller than document text, so the shuffle moves hashes + ids only.

    Returns the input rows that survive (one per distinct content).
    """
    content = normalize if normalize is not None else F.col(content_col)
    hashed = df.withColumn("__h", F.md5(content.cast("string")))
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to full parallelism before CPU-heavy per-row work.

    Document corpora are byte-small but compute-heavy (hashing every
    shingle): a 3 MB parquet file maps to ONE scan task, serializing the
    whole job. The repartition costs a shuffle of the raw rows and buys
    cluster-wide parallelism for everything downstream.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _barrier(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on ``cols`` with an EXPLICIT partition count.

    Serves two purposes at once: (1) an optimizer barrier — columns computed
    below the exchange become bound attributes, so higher-order-function
    pipelines above never re-inline them (no CSE through lambda bodies); and
    (2) guaranteed width — AQE coalesces keyless ``repartition(col)``
    exchanges by BYTE size, which collapses byte-small / CPU-heavy document
    stages onto 1-2 tasks; an explicit count is exempt from coalescing, so
    the hashing stages keep full parallelism.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, *cols)


def _with_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    from tickerlake_spark.functions.text import tokens, word_shingles

    # staged behind exchanges so tokens and shingles become bound attributes:
    # inline, the tokenizer/shingler would be re-evaluated per reference
    # through the HOF lambdas (no CSE) — measured 6x slower on this path
    # Binding discipline: every array column is computed on the MAP side of
    # an exchange (select BELOW repartition), so it reaches the next stage as
    # a bound attribute — HOF lambdas above never re-inline the tokenizer /
    # shingler (no CSE through lambda bodies; inline was measured 6x slower).
    # Two exchanges total: the spread (parallelism for byte-small corpora)
    # doubles as the token binder, the doc_id barrier as the shingle binder.
    from tickerlake_spark.functions.core import nondet_identity

    tok = _barrier(
        df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks"))
    )
    # nondet_identity (optimization r12, guide §4.4): the size filter below
    # references __shingles, and the exchanges are NOT pushdown barriers —
    # PushDownPredicates substituted the whole tokenizer+shingler pipeline
    # into the filter condition below BOTH repartitions, where the transform
    # lambda references the raw split() inline (not a bound attribute), so
    # the regex tokenizer re-ran per shingle per row. Measured: the shingle
    # stage cost 3.77s at sf0.1 with the re-inlined filter, 0.60s with the
    # barrier (tools/experiments/exp_q41_bandkey.py / OPTIMIZATION_r12.md).
    sh = _barrier(
        tok.select(
            "doc_id",
            nondet_identity(word_shingles(F.col("__toks"), n)).alias("__shingles"),
        ),
        "doc_id",
    )
    return sh.select("doc_id", "__shingles").filter(F.size("__shingles") > 0)


def signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """The materializable MinHash signature table: (doc_id, shingles, signature).

    At 100 TB the shingle+hash+signature pipeline is the expensive half of
    near-dup detection, and dedup runs repeatedly (per ingestion round, per
    threshold sweep). Compute this ONCE, write it to storage, and feed it
    back via ``minhash_lsh_pairs(signatures=...)`` — subsequent rounds read
    ~40 bytes/doc of signature instead of re-tokenizing the corpus.

        sigs = signature_table(docs)
        write_table(sigs, path)                      # once
        pairs = minhash_lsh_pairs(
            signatures=read_table(spark, path))      # every round after
    """
    from tickerlake_spark.functions.text import h60, minhash_signature

    # An explode + 32-codegen'd-min-aggregates reformulation of the MinHash
    # was measured SLOWER here (0.98s vs 0.67s at sf0.1 with the shingle
    # barrier in place): the agg side and the shingle side each recompute
    # the pipeline (no exchange reuse across the join), and the md5-in-HOF
    # cost it targeted turned out to be small once the re-inlined size
    # filter (see _with_shingles) was fixed. Kept as the single-pass fold.
    return _with_shingles(df, text_col, id_col, shingle_n).select(
        "doc_id",
        F.col("__shingles").alias("shingles"),
        minhash_signature(
            F.transform("__shingles", h60), num_hashes
        ).alias("signature"),
    )


def band_keys(
    signatures: DataFrame, bands: int = 8, num_hashes: int = 32
) -> DataFrame:
    """LSH band keys from a signature table: (doc_id, band, key).

    Each doc's ``num_hashes``-element MinHash signature is cut into
    ``bands`` slices; the slice itself (``array<long>``) is the key. Docs
    sharing ANY (band, key) are near-dup candidates.

    The key used to be the dash-joined DECIMAL STRING of the slice
    (optimization r12, guide §2.3 shuffle narrower types): both encodings
    are injective, so array equality holds exactly where the string
    equality held and the candidate pair set is identical — but the array
    form skips 4 long→string renders + a join per banded row, and every
    downstream hash/compare works on 4 fixed-width longs instead of a
    ~40-byte UTF8 string. Arrays are valid Spark equi-join/hash keys.
    """
    rows = num_hashes // bands
    return signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(F.col("signature"), b * rows + 1, rows).alias("key"),
                ),
            )
        ).alias("__bk"),
    ).select("doc_id", "__bk.band", "__bk.key")


def _band_self_join(banded: DataFrame, band_salt: int) -> DataFrame:
    """All candidate pairs (id_a < id_b) sharing a (band, key) bucket.

    ``band_salt`` <= 1: plain self-join — one reducer owns each bucket, and a
    pathological bucket (boilerplate corpus: one key holding p% of docs) gives
    that reducer O((p·N)²) work. AQE's skew-join split mitigates only after
    the shuffle has materialized the hot partition.

    ``band_salt`` = s > 1: triangle-replicate skew join. Each row gets a
    deterministic salt i = hash(doc_id) mod s and is replicated s ways into
    cells (i, j) on the left and (i', salt) on the right; the join key becomes
    (band, key, i, j), so an unordered pair (x, y) meets in exactly one cell
    (salt_x, salt_y) and a hot bucket's work is spread across s² reducers,
    each doing (B/s)² — the classic fragment-replicate plan for self-join
    skew. Cost: s× replication of the banded table (ids + band keys only,
    ~50 bytes/row — at 100 TB corpus scale this table is ~0.005% of input).
    Output is identical to the unsalted join (gated by
    ``test_salted_band_join_equals_plain``).
    """
    if band_salt <= 1:
        a = banded.alias("a")
        b = banded.alias("b")
        return a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    a, b = triangle_salt_sides(banded, "doc_id", band_salt)
    a, b = a.alias("a"), b.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & triangle_salt_cond("a", "b")
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))


def triangle_salt_sides(
    df: DataFrame, id_col: str, s: int
) -> tuple[DataFrame, DataFrame]:
    """The fragment-replicate sides of a salted self-join.

    Each row gets a deterministic salt i = hash(id) mod s and is replicated
    s ways: cells (i, j) on the left and (j', i) on the right, so an
    unordered pair (x, y) meets in EXACTLY one cell (salt_x, salt_y) and a
    hot key's quadratic work spreads across s^2 reducers. Join the returned
    frames with the caller's equi-keys AND ``triangle_salt_cond`` — output
    is identical to the unsalted self-join (gated by
    ``test_salted_band_join_equals_plain``). Shared by the LSH band join
    and the SemDeDup cell verify, so the one-cell-per-pair invariant lives
    in one place."""
    salt = F.pmod(F.xxhash64(id_col), F.lit(s)).cast("int")
    cells = F.explode(F.sequence(F.lit(0), F.lit(s - 1)))
    a = df.withColumn("__i", salt).withColumn("__j", cells)
    b = df.withColumn("__j", salt).withColumn("__i", cells)
    return a, b


def triangle_salt_cond(a: str, b: str) -> Column:
    """The cell-matching join condition for ``triangle_salt_sides``."""
    return (F.col(f"{a}.__i") == F.col(f"{b}.__i")) & (
        F.col(f"{a}.__j") == F.col(f"{b}.__j")
    )


def minhash_lsh_pairs(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.6,
    signatures: DataFrame | None = None,
    band_salt: int = 0,
    cache_out: list | None = None,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs: (id_a, id_b, jaccard).

    Pipeline (all set-based, no pairwise scan over the corpus):
      shingle -> h60 hash -> k-perm MinHash signature -> band keys ->
      self-join on (band, key) for candidates -> verify exact shingle-set
      Jaccard >= threshold.

    Scale: the only joins are equi-joins on band keys. A band key bucket at
    100 TB holds near-identical docs (plus rare collisions), so the candidate
    join output is ~linear in the number of true duplicates; AQE's skew-join
    split handles pathological buckets (e.g. boilerplate-heavy corpora).

    Pass ``signatures`` (a ``signature_table`` result, typically read back
    from storage) to skip the shingle/hash recompute entirely — repeated
    dedup rounds then touch only the persisted signatures, never the corpus
    text. ``num_hashes`` must match the value the table was built with.

    Pass ``band_salt`` > 1 for boilerplate-heavy corpora where one band key
    can hold a double-digit percentage of docs: the band self-join switches
    to a triangle-replicate skew join (see ``_band_self_join``) that spreads
    each hot bucket across ``band_salt``² reducers with identical output.

    When computing from ``df``, the signature table is persisted
    (MEMORY_AND_DISK): the plan is a diamond — band self-join (2 refs) +
    per-side shingle fetch for the verify (2 refs) — and without
    materialization the shingle+hash+signature pipeline executes 4x
    (measured: 4 parquet scans, 0 reused exchanges).

    Pass ``cache_out`` (a caller-owned list) to receive the internally
    persisted DataFrame(s): long-lived sessions should unpersist them once
    the result has been materialized, otherwise the cached signature table
    lives until LRU eviction / session end (optimization r12 — the
    measurement-hygiene debt VERDICT r11 flagged; ``curation_pipeline``
    releases it after the near-dedup stage's write).
    """
    from pyspark import StorageLevel

    if signatures is not None:
        sig = signatures.select(
            "doc_id",
            F.col("shingles").alias("__shingles"),
            F.col("signature").alias("__sig"),
        )
    else:
        if df is None:
            raise ValueError("pass either df (corpus) or signatures")
        sig = (
            signature_table(df, text_col, id_col, shingle_n, num_hashes)
            .select(
                "doc_id",
                F.col("shingles").alias("__shingles"),
                F.col("signature").alias("__sig"),
            )
            # Banding references __sig 4x per band, but the persist itself
            # is the physical boundary: consumers read bound attributes out
            # of the cached relation, so no extra exchange is needed here.
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if cache_out is not None:
            cache_out.append(sig)
    # band join on ids ONLY — exploding each doc's shingle array through the
    # 8-band self-join would shuffle every array 8x; instead the (small)
    # candidate pair set joins back to the shingle table to fetch arrays
    banded = band_keys(
        sig.select("doc_id", F.col("__sig").alias("signature")), bands, num_hashes
    )

    cand = _band_self_join(banded, band_salt).dropDuplicates(["id_a", "id_b"])
    shingle_sets = sig.select("doc_id", "__shingles")
    pairs = cand.join(
        shingle_sets.select(
            F.col("doc_id").alias("id_a"), F.col("__shingles").alias("__sa")
        ),
        "id_a",
    ).join(
        shingle_sets.select(
            F.col("doc_id").alias("id_b"), F.col("__shingles").alias("__sb")
        ),
        "id_b",
    )
    jacc = F.size(F.array_intersect("__sa", "__sb")) / F.size(
        F.array_union("__sa", "__sb")
    )
    return (
        pairs.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
) -> DataFrame:
    """SimHash near-duplicate pairs: (id_a, id_b, hamming).

    Candidates come from banding the simhash into ``bits/band_bits`` chunks —
    two docs within Hamming distance < #bands share at least one exact chunk
    (pigeonhole), so the self-join is an equi-join on (chunk_idx, chunk),
    never a pairwise scan.
    """
    from tickerlake_spark.functions.text import h60, simhash, tokens

    n_bands = bits // band_bits
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs < {n_bands} (pigeonhole bound "
            f"for {bits}-bit simhash with {band_bits}-bit bands)"
        )
    from pyspark import StorageLevel

    sh = (
        _spread(df)
        .select(
            F.col(id_col).alias("doc_id"),
            simhash(F.transform(tokens(text_col), h60), bits).alias("__sh"),
        )
        .transform(lambda d: _barrier(d, "doc_id"))  # barrier: chunk extraction references __sh per band
        # self-join reads the hash pipeline twice; materialize it once
        # (16 bytes/doc — trivially cacheable at any corpus size)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mask = (1 << band_bits) - 1
    chunks = sh.select(
        "doc_id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright(F.col("__sh"), i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("__c"),
    ).select("doc_id", "__sh", "__c.chunk_idx", "__c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    left: DataFrame,
    right: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle inverted index.

    Explodes shingles and joins on them (inverted-index join), counts shared
    shingles per pair, then computes |A∩B| / (|A| + |B| - |A∩B|). Linear in
    total postings, not quadratic in docs — the standard scalable exact-
    Jaccard plan. Use ``minhash_lsh_pairs`` when even the postings join is
    too hot (it prunes candidates before any join).
    """
    from pyspark import StorageLevel

    # materialize postings once: the self-join (right=None) reads them twice
    ls = (
        _with_shingles(left, text_col, id_col, shingle_n)
        .select(
            "doc_id", F.size("__shingles").alias("__n"), F.explode("__shingles").alias("__s")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rs = (
        ls
        if right is None
        else _with_shingles(right, text_col, id_col, shingle_n).select(
            "doc_id", F.size("__shingles").alias("__n"), F.explode("__shingles").alias("__s")
        )
    )
    a, b = ls.alias("a"), rs.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .agg(F.count("*").alias("__i"))
    )
    jacc = F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
    return (
        inter.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT (Broder 1997):
    |A∩B| / min(|A|, |B|) — the metric that catches a short document
    subsumed by a longer one (a quoted excerpt, a truncated crawl copy, a
    benchmark question embedded in a web page), which symmetric Jaccard
    dilutes below any usable threshold. Same inverted-index postings
    self-join as ``ngram_jaccard_pairs`` — linear in postings, never
    all-pairs; the Jaccard value rides along for contrast.
    """
    from pyspark import StorageLevel

    ls = (
        _with_shingles(df, text_col, id_col, shingle_n)
        .select(
            "doc_id",
            F.size("__shingles").alias("__n"),
            F.explode("__shingles").alias("__s"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = ls.alias("a"), ls.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .agg(F.count("*").alias("__i"))
    )
    cont = F.col("__i") / F.least("__na", "__nb")
    jacc = F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
    return (
        inter.withColumn("containment", cont)
        .withColumn("jaccard", jacc)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine >= threshold).

    Candidates from random-hyperplane LSH: bucket = sign pattern of
    ``n_planes`` deterministic pseudo-random projections (hash-derived plane
    coefficients, reproducible across runs/engines). Vectors with cosine
    ~1 agree on almost all sign bits, so near-dups share a bucket with high
    probability; the verify step computes exact cosine inside buckets only.
    """
    from tickerlake_spark.functions.vector import as_double_array, cosine_similarity
    from tickerlake_spark.operators.similarity import hyperplane_bucket

    from pyspark import StorageLevel

    v = df.select(F.col(id_col).alias("vid"), as_double_array(vec_col).alias("__v"))
    # vector width probe (one-row job) so the plane coefficients become
    # literal arrays instead of per-row md5 evaluation (similarity.py)
    first = df.select(F.size(vec_col)).first()
    dim = first[0] if first else None
    # self-join reads the projection pipeline twice; cache the bucketed table
    bucketed = v.withColumn(
        "__bucket", hyperplane_bucket(F.col("__v"), n_planes, dim=dim)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cos = cosine_similarity(F.col("a.__v"), F.col("b.__v"))
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
