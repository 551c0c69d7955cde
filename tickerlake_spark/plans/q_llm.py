"""LLM-data-pipeline queries: dedup suite, similarity search, text analysis.

Correctness design notes:
- The dedup corpora inject duplicates in-query (exact copies / one-token
  mutations / one-dim embedding perturbations) because the driver corpus is
  all-distinct — the operators must demonstrably FIND the dups, not return
  empty.
- MinHash-LSH has no recall guarantee, so its oracle mirrors the banding
  arithmetic exactly (same h60 hash, same permutations, same band keys).
- SimHash banding IS exact for max_hamming < n_bands (pigeonhole), so its
  oracle brute-forces all pairs — stronger check than mirroring.
- Integer-ratio outputs (jaccard, ratios) are bit-identical across engines;
  cosine outputs use stable_round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.functions.text import MINHASH_PRIME
from tickerlake_spark.plans.catalog import load_table, register

P = MINHASH_PRIME

# h60 in DuckDB
_H60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def _mutated_docs(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    """documents + injected duplicates: exact copies (doc_id+100000) or
    one-token-appended near-copies, for doc_id < 100 / < 25."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if exact:
        dup = d.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    else:
        dup = d.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qq"), F.col("doc_id").cast("string")).alias(
                "text"
            ),
        )
    return d.unionByName(dup)


_EXACT_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100
)"""

_NEAR_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         text || ' qq' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id < 25
)"""


@register(
    "q40_exact_dedup",
    doc="Exact content-hash dedup: keep lowest id per md5(text) over a "
    "corpus with 100 injected exact copies. One hash shuffle; the hash "
    "column (32B) is what moves, not the documents.",
    oracle=f"""
WITH {_EXACT_CORPUS_SQL}
SELECT md5(text) AS content_md5, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM corpus GROUP BY md5(text)
""",
)
def q40_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_docs(spark, sf_dir, exact=True)
    return corpus.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies")
    )


_MINHASH_SQL_BODY = f"""
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM corpus
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM tok WHERE len(t) >= 3
),
hs AS (
  SELECT doc_id, s,
         list_transform(s, x -> {_H60.format(x='x')}) AS hh
  FROM sh
),
sig AS (
  SELECT doc_id, s,
         list_transform(range(0, 32),
           j -> list_min(list_transform(hh,
                h -> ((1 + 41*j) * (h % {P}) + 7 + 17*j) % {P}))) AS sg
  FROM hs
),
banded AS (
  SELECT doc_id, s, b AS band,
         concat_ws('-', sg[4*b+1], sg[4*b+2], sg[4*b+3], sg[4*b+4]) AS key
  FROM sig, unnest(range(0, 8)) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""


@register(
    "q41_minhash_lsh_dedup",
    doc="MinHash(32) + LSH(8 bands) near-dup pairs with exact Jaccard "
    "verify >= 0.6, over a corpus with 25 injected one-token mutations. "
    "Oracle mirrors the banding arithmetic exactly (h60 + affine perms).",
    bench=True,
    oracle=f"""
WITH {_NEAR_CORPUS_SQL},
{_MINHASH_SQL_BODY}
SELECT id_a, id_b,
       CAST(len(list_intersect(sa, sb)) AS DOUBLE)
         / len(list_distinct(sa || sb)) AS jaccard
FROM cand
WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
        / len(list_distinct(sa || sb)) >= 0.6
""",
)
def q41_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import minhash_lsh_pairs

    corpus = _mutated_docs(spark, sf_dir, exact=False)
    return minhash_lsh_pairs(
        corpus, "text", "doc_id", shingle_n=3, num_hashes=32, bands=8,
        jaccard_threshold=0.6,
    )


_SIMHASH_SQL = f"""
sim AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN list_sum(list_transform(hh, h -> ((h >> b) & 1) * 2 - 1)) > 0
                THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
  FROM (
    SELECT doc_id,
           list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                          x -> {_H60.format(x='x')}) AS hh
    FROM corpus
  )
)"""


@register(
    "q42_simhash_fingerprint",
    doc="32-bit SimHash document fingerprints (majority vote per bit over "
    "token hashes) — identical bit arithmetic in both engines.",
    oracle=f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
{_SIMHASH_SQL}
SELECT doc_id, simhash FROM sim
""",
)
def q42_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import h60, simhash, tokens
    from tickerlake_spark.operators.dedup import _spread

    d = load_table(spark, sf_dir, "documents")
    return _spread(d).select(
        "doc_id", simhash(F.transform(tokens("text"), h60), 32).alias("simhash")
    )


@register(
    "q43_simhash_neardup",
    doc="SimHash near-dup pairs (Hamming <= 3) via 8-bit band candidates — "
    "exact by pigeonhole (3 < 4 bands), so the oracle brute-forces all "
    "pairs and the banded plan must find the identical set.",
    oracle=f"""
WITH {_NEAR_CORPUS_SQL},
{_SIMHASH_SQL}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q43_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import simhash_pairs

    corpus = _mutated_docs(spark, sf_dir, exact=False)
    out = simhash_pairs(corpus, "text", "doc_id", bits=32, max_hamming=3, band_bits=8)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "q44_ngram_jaccard",
    doc="Exact n-gram Jaccard pairs via shingle inverted-index join "
    "(postings equi-join + per-pair intersection count, never O(n^2)).",
    oracle=f"""
WITH {_NEAR_CORPUS_SQL},
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM corpus
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM tok WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
post AS (SELECT doc_id, unnest(s) AS g FROM sh),
-- inverted-index postings join (same shape as the Spark plan): linear in
-- postings, never the all-pairs list_intersect
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b,
       CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.5
""",
)
def q44_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import ngram_jaccard_pairs

    corpus = _mutated_docs(spark, sf_dir, exact=False)
    return ngram_jaccard_pairs(corpus, text_col="text", id_col="doc_id", threshold=0.5)


# documents + injected FRAGMENTS: the first half of each low-id doc's tokens
# as a new doc — a subsumed excerpt. Containment flags it at ~1.0 where
# Jaccard sits near |frag|/|full| and misses it.
_FRAG_CORPUS_SQL = r"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string(
           (regexp_split_to_array(lower(trim(text)), '\s+'))
             [1 : CAST(floor(len(regexp_split_to_array(lower(trim(text)), '\s+')) / 2.0) AS INT)],
           ' ') AS text
  FROM documents WHERE doc_id < 25
)"""


def _fragment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tokens("text")
    frag = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(
            F.slice(t, 1, F.floor(F.size(t) / 2).cast("int")), " "
        ).alias("text"),
    )
    return d.unionByName(frag)


@register(
    "q132_ngram_containment",
    doc="Asymmetric near-dup detection by shingle CONTAINMENT "
    "(|A∩B|/min(|A|,|B|), Broder 1997) on a corpus with injected "
    "half-document fragments: a subsumed excerpt scores ~1.0 containment "
    "while its Jaccard (reported alongside) sits near the length ratio — "
    "the metric split that matters for quote/truncation dedup and "
    "benchmark-contamination sweeps. Same linear inverted-index postings "
    "join as q44; never all-pairs.",
    oracle=f"""
WITH {_FRAG_CORPUS_SQL},
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM corpus
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM tok WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, len(s) AS n FROM sh),
post AS (SELECT doc_id, unnest(s) AS g FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b,
       CAST(i.c AS DOUBLE) / least(sa.n, sb.n) AS containment,
       CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.c AS DOUBLE) / least(sa.n, sb.n) >= 0.8
""",
)
def q132_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import ngram_containment_pairs

    corpus = _fragment_docs(spark, sf_dir)
    return ngram_containment_pairs(
        corpus, text_col="text", id_col="doc_id", threshold=0.8
    )


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------

_EMB_CORPUS_SQL = """
emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_concat([embedding[1]::DOUBLE + 0.1], (embedding::DOUBLE[])[2:]) AS v
  FROM embeddings WHERE vec_id < 25
)"""


def _mutated_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mut = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("v", 1) + 0.1), F.slice("v", 2, 10_000)
        ).alias("v"),
    )
    return e.unionByName(mut)


def _lsh_ann_oracle(n_planes: int = 8, dim: int = 64, k: int = 10) -> str:
    """DuckDB mirror of lsh_ann_topk: the SAME hash-derived plane
    coefficients (``_plane_coefs_py`` — bit-identical doubles) inlined as
    list literals, the same sign-pattern bucket, the same Hamming-1
    multiprobe set, the same rounded-cosine/id ordering. The testdata
    embedding dim is fixed at 64 across all SFs."""
    from tickerlake_spark.operators.similarity import _plane_coefs_py

    rows = ",\n    ".join(
        f"({p}, {_plane_coefs_py(p, dim)!r}::DOUBLE[])" for p in range(n_planes)
    )
    bucket = (
        "CAST(SUM(CASE WHEN list_sum(list_transform(range(1, {n}), "
        "i -> {v}[i] * pl.coefs[i])) > 0 THEN 1 << pl.p ELSE 0 END) AS BIGINT)"
    )
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
planes(p, coefs) AS (VALUES
    {rows}),
buck AS (
  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
         {bucket.format(n=dim + 1, v="(e.embedding::DOUBLE[])")} AS bucket
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, e.embedding
),
qbuck AS (
  SELECT {bucket.format(n=dim + 1, v="q.qv")} AS qb
  FROM q CROSS JOIN planes pl
),
probes AS (
  SELECT qb AS bucket FROM qbuck
  UNION
  SELECT xor(qb, 1 << CAST(pp AS INTEGER))
  FROM qbuck, unnest(range(0, {n_planes})) AS u(pp)
)
SELECT b.id, ROUND(list_cosine_similarity(b.v, q.qv) + 5e-9, 6) AS cosine
FROM buck b JOIN probes pr ON b.bucket = pr.bucket CROSS JOIN q
-- rank by the RAW cosine, not the rounded alias: the Spark side's top-k
-- (lsh_ann_topk) selects rows by raw value before the catalog wrapper
-- rounds, so ordering by the rounded value here could pick a different
-- row at the LIMIT boundary when two raw cosines round to the same 6dp
ORDER BY list_cosine_similarity(b.v, q.qv) DESC, id ASC
LIMIT {k}
"""


def _ivf_ann_oracle(
    n_cells: int = 16, n_probe: int = 4, dim: int = 64, k: int = 10
) -> str:
    """DuckDB mirror of ivf_topk: the same hash-derived UNIT centroids
    inlined as literals, nearest-cell assignment as row_number over
    (dot DESC, cell ASC) — exactly the array_min(struct(-dot, c)) tie-break
    Spark uses — and the same probe-cells / rounded re-rank."""
    import math

    from tickerlake_spark.operators.similarity import _plane_coefs_py

    cents = []
    for c in range(n_cells):
        raw = _plane_coefs_py(c * 1000 + 7, dim)
        norm = math.sqrt(sum(x * x for x in raw))
        cents.append([x / norm for x in raw])
    rows = ",\n    ".join(f"({c}, {u!r}::DOUBLE[])" for c, u in enumerate(cents))
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cents(c, u) AS (VALUES
    {rows}),
dots AS (
  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v, ct.c,
         list_sum(list_transform(range(1, {dim + 1}),
                  i -> (e.embedding::DOUBLE[])[i] * ct.u[i])) AS d
  FROM embeddings e CROSS JOIN cents ct
),
assigned AS (
  SELECT id, v, c AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY d DESC, c ASC) AS rn
    FROM dots)
  WHERE rn = 1
),
qd AS (
  SELECT ct.c, list_sum(list_transform(range(1, {dim + 1}),
               i -> q.qv[i] * ct.u[i])) AS d
  FROM q CROSS JOIN cents ct
),
probes AS (SELECT c FROM qd ORDER BY d DESC, c ASC LIMIT {n_probe})
SELECT a.id, ROUND(list_cosine_similarity(a.v, q.qv) + 5e-9, 6) AS cosine
FROM assigned a JOIN probes p ON a.cell = p.c CROSS JOIN q
-- raw-cosine ranking for the same LIMIT-boundary reason as the LSH oracle
ORDER BY list_cosine_similarity(a.v, q.qv) DESC, id ASC
LIMIT {k}
"""



@register(
    "q45_ann_bruteforce",
    doc="Exact cosine top-20 against a query vector (the ANN ground-truth "
    "baseline): broadcast query, scan, top-k with id tie-break.",
    bench=True,
    oracle="""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv) + 5e-9, 6) AS cosine
FROM embeddings e, q
ORDER BY cosine DESC, id ASC
LIMIT 20
""",
)
def q45_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.similarity import brute_force_topk

    e = load_table(spark, sf_dir, "embeddings")
    # corpus-resident query: 1-row broadcast, ONE Spark job — no driver
    # .first() collect + literal-replan (optimization r11; scores bitwise
    # identical, see brute_force_topk)
    q_df = e.filter(F.col("vec_id") == 0).select("embedding")
    scored = brute_force_topk(e, q_df, k=10_000_000)  # score all, round, re-rank
    return (
        scored.select("id", stable_round(F.col("cosine"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(20)
    )


@register(
    "q46_embedding_neardup",
    doc="Embedding-cosine near-dup pairs via hyperplane-LSH buckets + exact "
    "verify, over 25 injected one-dim perturbations. Oracle mirrors the "
    "hash-derived hyperplanes exactly.",
    oracle=f"""
WITH {_EMB_CORPUS_SQL},
planes AS (
  SELECT p, list_transform(range(1, 65),
           i -> ({_H60.format(x="'plane:' || p || ':' || i")} % {P})
                / CAST({P} AS DOUBLE) - 0.5) AS coef
  FROM unnest(range(0, 8)) AS t(p)
),
bucketed AS (
  SELECT vec_id, v,
         CAST(SUM(CASE WHEN list_dot_product(v, coef) > 0
                       THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM emb, planes
  GROUP BY vec_id, v
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v) + 5e-9, 6) AS cosine
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.98
""",
)
def q46_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.dedup import embedding_neardup_pairs

    emb = _mutated_embeddings(spark, sf_dir)
    pairs = embedding_neardup_pairs(
        emb, vec_col="v", id_col="vec_id", threshold=0.98, n_planes=8
    )
    return pairs.select(
        "id_a", "id_b", stable_round(F.col("cosine"), 6).alias("cosine")
    )


@register(
    "q47_lsh_ann",
    doc="Hyperplane-LSH approximate top-10 with multiprobe (Hamming-1 "
    "buckets) + exact re-rank. 'Approximate' means approximate vs brute "
    "force (recall gated in pytest), NOT nondeterministic: the plane "
    "coefficients are hash-derived literals, so the oracle mirrors the "
    "bucket arithmetic with the SAME coefficient values inlined and the "
    "result is fully value-hashable.",
    oracle=_lsh_ann_oracle(),
)
def q47_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.similarity import lsh_ann_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    res = lsh_ann_topk(e, qvec, k=10, n_planes=8)
    return res.select("id", stable_round(F.col("cosine"), 6).alias("cosine"))


@register(
    "q48_ivf_ann",
    doc="IVF-style ANN: 16 hash-derived coarse cells, probe nearest 4, "
    "exact re-rank inside. Deterministic end-to-end (hash-derived unit "
    "centroids inlined as literals on both engines), so it gets a full "
    "value-hash oracle; recall vs brute force is gated in pytest.",
    oracle=_ivf_ann_oracle(),
)
def q48_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    res = ivf_topk(e, qvec, k=10, n_cells=16, n_probe=4)
    return res.select("id", stable_round(F.col("cosine"), 6).alias("cosine"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "q49_text_stats",
    doc="Quality-scoring features: char/token counts, punct/upper/stopword "
    "ratios, composite quality flag (pretraining-filter style). Pure "
    "per-row map, zero shuffles.",
    oracle=r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
       length(regexp_replace(lower(trim(text)), '\s+', '', 'g'))
         / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS avg_token_len,
       (length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')))
         / CAST(length(text) AS DOUBLE) AS punct_ratio,
       length(regexp_replace(text, '[^A-Z]', '', 'g'))
         / CAST(length(text) AS DOUBLE) AS upper_ratio,
       len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
           x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))
         / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS stopword_ratio,
       (len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 10
        AND (length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g')))
              / CAST(length(text) AS DOUBLE) <= 0.2
        AND length(regexp_replace(lower(trim(text)), '\s+', '', 'g'))
              / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE)
              BETWEEN 2.0 AND 12.0) AS is_quality
FROM documents
""",
)
def q49_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.text_analysis import text_stats

    return text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "q50_language_id",
    doc="Stopword-lexicon language heuristic with deterministic argmax "
    "(n-gram language-ID family).",
    oracle=r"""
WITH scored AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))
      / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS s_en,
    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        x -> list_contains(['el','la','de','y','que','en','un','una','es','por'], x)))
      / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS s_es,
    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        x -> list_contains(['le','la','de','et','que','en','un','une','est','pour'], x)))
      / CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS s_fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN s_fr > s_es AND s_fr > s_en AND s_fr > 0 THEN 'fr'
            WHEN s_es > s_en AND s_es > 0 THEN 'es'
            WHEN s_en > 0 THEN 'en'
            ELSE 'und' END AS detected_lang,
       GREATEST(s_en, s_es, s_fr, 0.0) AS lang_score
FROM scored
""",
)
def q50_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.text_analysis import detect_language

    return detect_language(load_table(spark, sf_dir, "documents"))


@register(
    "q51_fingerprint",
    doc="Document fingerprints: md5, 60-bit content hash, distinct 5-char "
    "rolling shingle count.",
    oracle=f"""
SELECT doc_id,
       md5(text) AS content_md5,
       {_H60.format(x='lower(trim(text))')} AS content_h60,
       CAST(len(list_distinct(list_transform(
            range(1, greatest(length(lower(trim(text))) - 4, 0) + 1),
            i -> substr(lower(trim(text)), i, 5)))) AS BIGINT) AS distinct_shingles_5
FROM documents
""",
)
def q51_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.text_analysis import fingerprint

    return fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "q52_token_count",
    doc="Token counting: whitespace tokens + BPE-ish regex tokens "
    "(words / punctuation marks).",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def q52_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


@register(
    "q53_json_props",
    doc="JSON field extraction from the events props column (semi-structured "
    "capability beyond the reference).",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def q53_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "q56_repetition_ratio",
    doc="Within-document n-gram repetition ratios (Gopher/FineWeb-style "
    "boilerplate signal): rep_k = 1 - distinct_k_grams/total_k_grams, "
    "flagged over per-k thresholds. Pure per-row map, zero shuffles.",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 2
         THEN list_transform(range(1, len(t)), i -> array_to_string(list_slice(t, i, i + 1), ' '))
         ELSE [] END AS g2,
    CASE WHEN len(t) >= 3
         THEN list_transform(range(1, len(t) - 1), i -> array_to_string(list_slice(t, i, i + 2), ' '))
         ELSE [] END AS g3
  FROM toks
),
rep AS (
  SELECT doc_id,
    CASE WHEN len(g2) > 0 THEN 1 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE) ELSE 0.0 END AS r2,
    CASE WHEN len(g3) > 0 THEN 1 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE) ELSE 0.0 END AS r3
  FROM grams
)
SELECT doc_id,
       ROUND(r2 + 5e-9, 6) AS rep_2gram,
       ROUND(r3 + 5e-9, 6) AS rep_3gram,
       (r2 > 0.3 OR r3 > 0.2) AS is_repetitious
FROM rep
""",
)
def q56_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.text_analysis import repetition_stats

    df = repetition_stats(load_table(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        stable_round(F.col("rep_2gram"), 6).alias("rep_2gram"),
        stable_round(F.col("rep_3gram"), 6).alias("rep_3gram"),
        "is_repetitious",
    )


@register(
    "q118_doc_chunking",
    doc="Sliding-window document chunking (100 chars, stride 80 = 20 "
    "overlap) — the context-window splitter every RAG/training pipeline "
    "runs before embedding. posexplode(sequence(...)) fans each doc into "
    "its chunk index range map-side (no shuffle, no UDF); chunk text via "
    "substring arithmetic. Integer+string outputs only — hash-exact.",
    oracle="""
SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
       substr(text, CAST(1 + k * 80 AS BIGINT), 100) AS chunk_text,
       CAST(length(substr(text, CAST(1 + k * 80 AS BIGINT), 100)) AS BIGINT)
         AS chunk_len
FROM documents
CROSS JOIN unnest(range(0, (length(text) - 1) // 80 + 1)) AS t(k)
WHERE length(text) > 0
""",
)
def q118_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    k = F.posexplode(
        F.sequence(F.lit(0).cast("long"), F.floor((ln - 1) / 80))
    )
    return (
        d.filter(ln > 0)
        .select("doc_id", "text", k.alias("__pos", "k"))
        .select(
            "doc_id",
            F.col("k").cast("int").alias("chunk_id"),
            F.substring("text", (F.lit(1) + F.col("k") * 80).cast("int"), 100).alias(
                "chunk_text"
            ),
            F.length(
                F.substring("text", (F.lit(1) + F.col("k") * 80).cast("int"), 100)
            )
            .cast("long")
            .alias("chunk_len"),
        )
    )


@register(
    "q119_sequence_packing",
    doc="Training-sequence packing: concatenate documents in id order and "
    "cut every 256 tokens (documents may straddle cuts — the GPT-style "
    "pack-then-chunk layout). Packing is PER SHARD (doc_id % 8): a global "
    "token prefix-sum would serialize on one partition at 100 TB, but "
    "training shards are independent output files anyway, so the window "
    "partitions by shard and the prefix-sum parallelizes shard-wise. "
    "All-integer output — no float hash risk by construction.",
    oracle=r"""
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens,
       cum_before // 256 AS seq_id,
       cum_before % 256 AS seq_offset
FROM c
""",
)
def q119_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("cum_before") / 256).alias("seq_id"),
        (F.col("cum_before") % 256).alias("seq_offset"),
    )


@register(
    "q120_benchmark_decontamination",
    doc="Benchmark decontamination (the GPT-3/Pile 13-gram method, here "
    "5-grams for the synthetic corpus): flag training documents sharing "
    "any word n-gram with a held-out benchmark set (docs 0-19). The "
    "benchmark's distinct grams are a small relation -> broadcast hash "
    "join against the exploded corpus grams; per-doc distinct-hit count, "
    "zero-filled via left join. At 100 TB the corpus side streams "
    "map-side against the broadcast gram set — no corpus shuffle until "
    "the per-doc count, which carries only (doc_id, gram) hits.",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 3),
                i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS g
  FROM toks WHERE len(t) >= 5
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 20),
hits AS (
  SELECT d.doc_id, CAST(COUNT(DISTINCT d.g) AS BIGINT) AS n_hit
  FROM grams d JOIN bench b ON d.g = b.g
  WHERE d.doc_id >= 20 GROUP BY d.doc_id
)
SELECT doc.doc_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       (h.doc_id IS NOT NULL) AS is_contaminated
FROM documents doc LEFT JOIN hits h ON doc.doc_id = h.doc_id
WHERE doc.doc_id >= 20
""",
)
def q120_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower("text")), r"\s+")
    toks = d.select("doc_id", t.alias("t"))
    grams = (
        toks.filter(F.size("t") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 4),
                    lambda i: F.concat_ws(" ", F.slice("t", i, 5)),
                )
            ).alias("g"),
        )
    )
    bench = grams.filter(F.col("doc_id") < 20).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").cast("long").alias("n_hit"))
    )
    return (
        d.filter(F.col("doc_id") >= 20)
        .select("doc_id")
        .join(hits.withColumnRenamed("doc_id", "__h"), F.col("doc_id") == F.col("__h"), "left")
        .select(
            "doc_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.col("__h").isNotNull().alias("is_contaminated"),
        )
    )


@register(
    "q142_semantic_decontamination",
    doc="Semantic benchmark decontamination — the embedding-space "
    "complement of q120's 5-gram overlap check (Phi/GPT-style 'fuzzy' "
    "contamination that paraphrasing hides from n-grams): flag every "
    "train vector whose max cosine to ANY held-out benchmark vector "
    "(vec_id % 25 == 0) clears 0.99. The benchmark side is tiny at any "
    "corpus scale, so the right 100 TB plan is exactly this one: "
    "broadcast the benchmark matrix and score map-side — one pass over "
    "the train table, no shuffle of vectors, then a per-vector max. "
    "Contaminated copies are injected (benchmark vectors, one dim "
    "nudged, +500000 ids) so the flag provably fires; the oracle "
    "mirrors the injection.",
    oracle="""
WITH bench AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 25 = 0
),
train AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 25 <> 0
  UNION ALL
  SELECT vec_id + 500000,
         list_concat([embedding[1]::DOUBLE + 0.01], (embedding::DOUBLE[])[2:]) AS v
  FROM embeddings WHERE vec_id % 25 = 0
),
scored AS (
  SELECT t.vec_id, MAX(list_cosine_similarity(t.v, b.v)) AS mx
  FROM train t CROSS JOIN bench b
  GROUP BY t.vec_id
)
SELECT vec_id, ROUND(mx + 5e-9, 6) AS max_bench_cosine
FROM scored WHERE mx >= 0.99
ORDER BY vec_id
""",
)
def q142_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.vector import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bench = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv")
    )
    injected = e.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("v", 1) + 0.01), F.slice("v", 2, 10_000)
        ).alias("v"),
    )
    train = e.filter(F.col("vec_id") % 25 != 0).unionByName(injected)
    scored = (
        train.crossJoin(F.broadcast(bench))
        .select(
            "vec_id", cosine_similarity(F.col("v"), F.col("bv")).alias("c")
        )
        .groupBy("vec_id")
        .agg(F.max("c").alias("mx"))
    )
    return (
        scored.filter(F.col("mx") >= 0.99)
        .select("vec_id", stable_round(F.col("mx"), 6).alias("max_bench_cosine"))
        .orderBy("vec_id")
    )
