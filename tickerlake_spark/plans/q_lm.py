"""Vector compression + statistical-LM corpus queries (q127-q129).

q127 adds the missing tier of the ANN ladder (q45 brute force -> q47/q48
hash/IVF pruned -> q117 trained IVF): product quantization with an
asymmetric-distance (ADC) scan — the representation that makes vector search
affordable when the vectors themselves are the dominant storage cost. The
full train/encode/score loop is deterministic under the k-means contract of
``operators/clustering.py``, so unlike most PQ implementations it gets a
hard value-hash oracle: the DuckDB side unrolls all four per-subspace
k-means runs as CTE chains (same pattern as ``q_cluster._kmeans_ctes``).

q128/q129 are the corpus-statistics stages of an LLM data pipeline the
catalog didn't yet cover: vocabulary construction (the precursor to any
tokenizer training) and CCNet-style statistical language-model scoring
(Wenzek et al. 2020 filter web text by LM perplexity; a corpus-trained
add-one-smoothed bigram model is the SQL-expressible core of that shape —
the score is the per-document mean negative log-likelihood of its bigrams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.functions.text import tokens
from tickerlake_spark.plans.catalog import load_table, register

DIM = 64
M = 4  # subspaces
SUB = DIM // M
K = 8  # codes per subspace
ITERS = 2
TOPN = 20
VOCAB_N = 20

_TOK_SQL = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def _d2_sql(vec: str, cent: str, d: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {d + 1}), "
        f"j -> ({vec}[j] - {cent}[j]) * ({vec}[j] - {cent}[j])), 'sum')"
    )


def _pq_ctes() -> str:
    """Four independent k-means CTE chains over 16-dim vector slices, each
    ending in a final-codebook encode (``s{s}enc``) and the query's ADC
    distance table (``s{s}dt``). Mirrors ``operators/pq.py`` exactly:
    rounded centroids per iteration, index-order folds, cell-asc ties,
    empty cells keep their previous centroid, encode against the FINAL
    codebook."""
    parts = [
        """vvecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)""",
        "qv AS (SELECT e AS q FROM vvecs WHERE vec_id = 0)",
    ]
    for s in range(M):
        lo, hi = s * SUB + 1, (s + 1) * SUB
        p = f"s{s}"
        parts.append(f"{p}v AS (SELECT vec_id, e[{lo}:{hi}] AS e FROM vvecs)")
        parts.append(f"""{p}c0 AS (
  SELECT rn - 1 AS cell, e AS cvec FROM (
    SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) AS rn FROM {p}v)
  WHERE rn <= {K}
)""")
        for i in range(1, ITERS + 1):
            prev = i - 1
            parts.append(f"""{p}d{i} AS (
  SELECT v.vec_id, v.e, c.cell, {_d2_sql("v.e", "c.cvec", SUB)} AS d2
  FROM {p}v v CROSS JOIN {p}c{prev} c
)""")
            parts.append(f"""{p}a{i} AS (
  SELECT vec_id, e, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2 ASC, cell ASC) AS rn
    FROM {p}d{i}) WHERE rn = 1
)""")
            parts.append(f"""{p}m{i} AS (
  SELECT cell, u.j - 1 AS pos, ROUND(AVG(e[u.j]) + 5e-9, 6) AS val
  FROM {p}a{i} CROSS JOIN (SELECT unnest(range(1, {SUB + 1})) AS j) u
  GROUP BY cell, u.j
)""")
            parts.append(f"""{p}c{i} AS (
  SELECT pc.cell, COALESCE(m.cvec, pc.cvec) AS cvec
  FROM {p}c{prev} pc LEFT JOIN (
    SELECT cell, list(val ORDER BY pos) AS cvec FROM {p}m{i} GROUP BY cell) m
  ON pc.cell = m.cell
)""")
        parts.append(f"""{p}enc AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_d2_sql("v.e", "c.cvec", SUB)} ASC, c.cell ASC) AS rn
    FROM {p}v v CROSS JOIN {p}c{ITERS} c) WHERE rn = 1
)""")
        parts.append(f"""{p}dt AS (
  SELECT c.cell, {_d2_sql(f"(qv.q[{lo}:{hi}])", "c.cvec", SUB)} AS d
  FROM {p}c{ITERS} c, qv
)""")
    return "WITH " + ",\n".join(parts)


@register(
    "q127_pq_adc_ann",
    doc="Product quantization ANN (Jégou et al. 2011): 64-dim embeddings "
    "split into 4x16-dim subspaces, each k-means'd (k=8, 2 iterations) "
    "independently; every vector stored as 4 small codes; the query ranks "
    "the corpus by asymmetric distance — a driver-computed 4x8 distance "
    "table shipped as array literals, m lookups + 3 adds per row, the scan "
    "reading ONLY code columns. At 100 TB this is the representation that "
    "shrinks the vector table ~128x and makes the candidate scan "
    "bytes-per-row cheap; training/encode/score are all map-side after "
    "4 bounded k-means loops. Deterministic end-to-end, so the whole "
    "PQ pipeline gets a value-hash oracle (4 unrolled k-means CTE chains).",
    oracle=_pq_ctes()
    + f"""
SELECT e0.vec_id AS id,
       CAST(e0.cell AS INT) AS code_0, CAST(e1.cell AS INT) AS code_1,
       CAST(e2.cell AS INT) AS code_2, CAST(e3.cell AS INT) AS code_3,
       ROUND(dt0.d + dt1.d + dt2.d + dt3.d + 5e-9, 6) AS adc_d2
FROM s0enc e0
JOIN s1enc e1 ON e1.vec_id = e0.vec_id
JOIN s2enc e2 ON e2.vec_id = e0.vec_id
JOIN s3enc e3 ON e3.vec_id = e0.vec_id
JOIN s0dt dt0 ON dt0.cell = e0.cell
JOIN s1dt dt1 ON dt1.cell = e1.cell
JOIN s2dt dt2 ON dt2.cell = e2.cell
JOIN s3dt dt3 ON dt3.cell = e3.cell
ORDER BY dt0.d + dt1.d + dt2.d + dt3.d ASC, e0.vec_id ASC
LIMIT {TOPN}""",
)
def q127_pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.pq import adc_distance, pq_encode, pq_fit

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    codebooks = pq_fit(
        emb, dim=DIM, m=M, k=K, iters=ITERS, vec_col="embedding", id_col="vec_id"
    )
    qvec = [float(x) for x in base.filter(F.col("id") == 0).select("v").first()[0]]
    enc = pq_encode(base, codebooks, vec_col="v")
    return (
        enc.withColumn("__raw", adc_distance(codebooks, qvec))
        .orderBy(F.col("__raw").asc(), F.col("id").asc())
        .limit(TOPN)
        .select(
            "id",
            "code_0",
            "code_1",
            "code_2",
            "code_3",
            stable_round(F.col("__raw"), 6).alias("adc_d2"),
        )
    )


@register(
    "q128_vocab_topk",
    doc=f"Vocabulary construction (tokenizer-training precursor): corpus "
    f"token frequencies -> top-{VOCAB_N} tokens with dense contiguous ids "
    f"assigned in (count desc, token asc) order. Plan: explode -> hash agg "
    f"(map-side combine; the shuffle carries one row per distinct token, "
    f"never document text) -> TakeOrderedAndProject top-{VOCAB_N} -> "
    f"row_number over the {VOCAB_N}-row result (bounded by the vocab size, "
    f"NOT the corpus — the single-partition window is post-limit).",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_TOK_SQL}) AS w FROM documents
),
counts AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok WHERE w <> '' GROUP BY w
),
top AS (SELECT w, n FROM counts ORDER BY n DESC, w ASC LIMIT {VOCAB_N})
SELECT CAST(row_number() OVER (ORDER BY n DESC, w ASC) - 1 AS BIGINT) AS token_id,
       w AS token, n
FROM top""",
)
def q128_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("w")).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("w").asc()).limit(VOCAB_N)
    w_ord = Window.orderBy(F.col("n").desc(), F.col("w").asc())
    return top.select(
        (F.row_number().over(w_ord) - 1).cast("long").alias("token_id"),
        F.col("w").alias("token"),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "q129_bigram_nll",
    doc="Statistical-LM quality scoring (the CCNet shape, Wenzek et al. "
    "2020): train an add-one-smoothed bigram model on the corpus, score "
    "each document by the mean negative log-likelihood of its bigrams — "
    "high nll = atypical/low-quality text, the standard perplexity filter. "
    "Plan: bigrams via zip_with over the token array (map-side, no "
    "self-join); model = two hash aggs (bigram and unigram counts); "
    "scoring = two equi-joins on token keys + one broadcast scalar (vocab "
    "size) + per-doc avg. Every shuffle carries token/count pairs, never "
    "text; linear in total tokens at 100 TB.",
    oracle="""
WITH t AS (
  SELECT doc_id, """
    + _TOK_SQL
    + """ AS t FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS w FROM t),
uni AS (SELECT w, COUNT(*) AS c1 FROM tok WHERE w <> '' GROUP BY w),
vs AS (SELECT COUNT(*) AS v FROM uni),
pp AS (
  SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 j -> {'w1': t[j], 'w2': t[j + 1]})) AS bg
    FROM t WHERE len(t) >= 2)
),
bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pp GROUP BY w1, w2),
scored AS (
  SELECT p.doc_id, -ln((b.c2 + 1.0) / (u.c1 + vs.v)) AS nll1
  FROM pp p
  JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
  JOIN uni u ON u.w = p.w1
  CROSS JOIN vs
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(nll1) + 5e-9, 6) AS nll
FROM scored GROUP BY doc_id""",
)
def q129_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("t"))
    tok = t.select(F.explode("t").alias("w")).filter(F.col("w") != "")
    uni = tok.groupBy("w").agg(F.count("*").alias("c1"))
    vs = uni.agg(F.count("*").alias("v"))
    pp = (
        t.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), "
                    "(a, b) -> named_struct('w1', a, 'w2', b))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bi = pp.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    scored = (
        pp.join(bi, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vs))
        .withColumn("nll1", -F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        stable_round(F.avg("nll1"), 6).alias("nll"),
    )
