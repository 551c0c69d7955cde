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


_VVECS_CTE = """vvecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)"""
_QV_CTE = "qv AS (SELECT e AS q FROM vvecs WHERE vec_id = 0)"


def _kmeans_chain(prefix: str, src: str, dim: int, k: int, iters: int) -> list[str]:
    """k-means CTE chain ``{prefix}c0..{prefix}c{iters}`` over source CTE
    ``src`` with columns (vec_id, e). Mirrors ``operators/clustering
    .kmeans_fit`` exactly: init = embeddings of the k lowest ids, rounded
    centroids per iteration, index-order folds, cell-asc ties, empty cells
    keep their previous centroid."""
    parts = [f"""{prefix}c0 AS (
  SELECT rn - 1 AS cell, e AS cvec FROM (
    SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) AS rn FROM {src})
  WHERE rn <= {k}
)"""]
    for i in range(1, iters + 1):
        prev = i - 1
        parts.append(f"""{prefix}d{i} AS (
  SELECT v.vec_id, v.e, c.cell, {_d2_sql("v.e", "c.cvec", dim)} AS d2
  FROM {src} v CROSS JOIN {prefix}c{prev} c
)""")
        parts.append(f"""{prefix}a{i} AS (
  SELECT vec_id, e, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2 ASC, cell ASC) AS rn
    FROM {prefix}d{i}) WHERE rn = 1
)""")
        parts.append(f"""{prefix}m{i} AS (
  SELECT cell, u.j - 1 AS pos, ROUND(AVG(e[u.j]) + 5e-9, 6) AS val
  FROM {prefix}a{i} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS j) u
  GROUP BY cell, u.j
)""")
        parts.append(f"""{prefix}c{i} AS (
  SELECT pc.cell, COALESCE(m.cvec, pc.cvec) AS cvec
  FROM {prefix}c{prev} pc LEFT JOIN (
    SELECT cell, list(val ORDER BY pos) AS cvec FROM {prefix}m{i} GROUP BY cell) m
  ON pc.cell = m.cell
)""")
    return parts


def _encode_cte(prefix: str, src: str, dim: int, iters: int) -> str:
    """``{prefix}enc`` (vec_id, cell): nearest FINAL-codebook cell per row of
    ``src`` — the assignment the Spark side performs against the returned
    (post-update) centroids."""
    return f"""{prefix}enc AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_d2_sql("v.e", "c.cvec", dim)} ASC, c.cell ASC) AS rn
    FROM {src} v CROSS JOIN {prefix}c{iters} c) WHERE rn = 1
)"""


def _pq_ctes() -> str:
    """Four independent k-means CTE chains over 16-dim vector slices, each
    ending in a final-codebook encode (``s{s}enc``) and the query's ADC
    distance table (``s{s}dt``). Mirrors ``operators/pq.py``."""
    parts = [_VVECS_CTE, _QV_CTE]
    for s in range(M):
        lo, hi = s * SUB + 1, (s + 1) * SUB
        p = f"s{s}"
        parts.append(f"{p}v AS (SELECT vec_id, e[{lo}:{hi}] AS e FROM vvecs)")
        parts.extend(_kmeans_chain(p, f"{p}v", SUB, K, ITERS))
        parts.append(_encode_cte(p, f"{p}v", SUB, ITERS))
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


def _ivfpq_ctes() -> str:
    """IVF-PQ with residual encoding, fully unrolled: a coarse k-means chain
    (``g``) over full 64-dim vectors, residuals r = e - coarse_centroid, four
    per-subspace PQ chains TRAINED ON RESIDUALS, the query's 2 probed cells,
    per-probe query residuals, and per-(probe, code) ADC distance tables."""
    parts = [_VVECS_CTE, _QV_CTE]
    parts.extend(_kmeans_chain("g", "vvecs", DIM, K, ITERS))
    parts.append(_encode_cte("g", "vvecs", DIM, ITERS))
    parts.append(f"""res AS (
  SELECT a.vec_id, a.cell AS gcell,
         list_transform(range(1, {DIM + 1}), j -> v.e[j] - c.cvec[j]) AS e
  FROM genc a
  JOIN vvecs v ON v.vec_id = a.vec_id
  JOIN gc{ITERS} c ON c.cell = a.cell
)""")
    for s in range(M):
        lo, hi = s * SUB + 1, (s + 1) * SUB
        p = f"r{s}"
        parts.append(f"{p}v AS (SELECT vec_id, e[{lo}:{hi}] AS e FROM res)")
        parts.extend(_kmeans_chain(p, f"{p}v", SUB, K, ITERS))
        parts.append(_encode_cte(p, f"{p}v", SUB, ITERS))
    parts.append(f"""probes AS (
  SELECT c.cell FROM gc{ITERS} c, qv
  ORDER BY {_d2_sql("qv.q", "c.cvec", DIM)} ASC, c.cell ASC LIMIT {N_PROBE}
)""")
    parts.append(f"""qres AS (
  SELECT g.cell AS gcell,
         list_transform(range(1, {DIM + 1}), j -> qv.q[j] - g.cvec[j]) AS qr
  FROM gc{ITERS} g, qv WHERE g.cell IN (SELECT cell FROM probes)
)""")
    for s in range(M):
        lo, hi = s * SUB + 1, (s + 1) * SUB
        parts.append(f"""pdt{s} AS (
  SELECT q.gcell, c.cell AS code,
         {_d2_sql(f"(q.qr[{lo}:{hi}])", "c.cvec", SUB)} AS d
  FROM qres q CROSS JOIN r{s}c{ITERS} c
)""")
    return "WITH " + ",\n".join(parts)


N_PROBE = 2


@register(
    "q130_ivfpq_ann",
    doc="IVF-PQ with residual encoding — the billion-scale ANN architecture "
    "(Jégou et al. 2011, the FAISS IVFPQ layout): a coarse k-means "
    "quantizer prunes to n_probe=2 of 8 cells, PQ codebooks trained on the "
    "RESIDUAL (vector minus its coarse centroid) score the survivors via "
    "per-probe ADC tables, approx top-10. At 100 TB the index table stores "
    "(id, coarse_cell, 4 codes): cell-partitioned pruning reads n_probe/k "
    "of the files, the ADC scan reads a few bytes per row, and only a "
    "final re-rank (not shown; see q117) would touch real vectors. "
    "Deterministic end-to-end under the k-means contract, so the complete "
    "coarse+residual-PQ pipeline — five unrolled k-means chains — gets a "
    "value-hash oracle.",
    oracle=_ivfpq_ctes()
    + f"""
SELECT r.vec_id AS id, CAST(r.gcell AS INT) AS gcell,
       CAST(e0.cell AS INT) AS code_0, CAST(e1.cell AS INT) AS code_1,
       CAST(e2.cell AS INT) AS code_2, CAST(e3.cell AS INT) AS code_3,
       ROUND(dt0.d + dt1.d + dt2.d + dt3.d + 5e-9, 6) AS adc_d2
FROM res r
JOIN r0enc e0 ON e0.vec_id = r.vec_id
JOIN r1enc e1 ON e1.vec_id = r.vec_id
JOIN r2enc e2 ON e2.vec_id = r.vec_id
JOIN r3enc e3 ON e3.vec_id = r.vec_id
JOIN pdt0 dt0 ON dt0.gcell = r.gcell AND dt0.code = e0.cell
JOIN pdt1 dt1 ON dt1.gcell = r.gcell AND dt1.code = e1.cell
JOIN pdt2 dt2 ON dt2.gcell = r.gcell AND dt2.code = e2.cell
JOIN pdt3 dt3 ON dt3.gcell = r.gcell AND dt3.code = e3.cell
WHERE r.gcell IN (SELECT cell FROM probes)
ORDER BY dt0.d + dt1.d + dt2.d + dt3.d ASC, r.vec_id ASC
LIMIT 10""",
)
def q130_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.clustering import (
        assign_cells,
        kmeans_fit,
        nearest_cells,
    )
    from tickerlake_spark.operators.pq import adc_distance, pq_encode, pq_fit

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    gcent, _ = kmeans_fit(emb, k=K, iters=ITERS, vec_col="embedding")

    # residuals: map-side subtract of the broadcast coarse-centroid literal
    cmat = F.array(*[F.lit(c).cast("array<double>") for c in gcent])
    res = assign_cells(base, gcent, vec_col="v", cell_col="gcell").withColumn(
        "r",
        F.zip_with("v", F.element_at(cmat, F.col("gcell") + 1), lambda x, y: x - y),
    )
    codebooks = pq_fit(res, dim=DIM, m=M, k=K, iters=ITERS, vec_col="r", id_col="id")

    qvec = [float(x) for x in base.filter(F.col("id") == 0).select("v").first()[0]]
    probes = nearest_cells(gcent, qvec, N_PROBE)

    enc = pq_encode(res, codebooks, vec_col="r")
    # per-probe ADC: the query's residual differs per probed cell, so each
    # probe gets its own driver-computed table (bounded: n_probe x m x k)
    def _adc_for(cell: int):
        qr = [qvec[j] - gcent[cell][j] for j in range(DIM)]
        return adc_distance(codebooks, qr)

    scored = enc.filter(F.col("gcell").isin(probes))
    raw = F.when(F.col("gcell") == probes[0], _adc_for(probes[0]))
    for p in probes[1:]:
        raw = raw.when(F.col("gcell") == p, _adc_for(p))
    return (
        scored.withColumn("__raw", raw)
        .orderBy(F.col("__raw").asc(), F.col("id").asc())
        .limit(10)
        .select(
            "id",
            F.col("gcell").cast("int").alias("gcell"),
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


_BM25_ORACLE_CTES = """
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents
),
doclen AS (SELECT doc_id, len(t) AS dl FROM tok WHERE len(t) > 0),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM doclen),
terms AS (
  SELECT doc_id, unnest(t) AS term FROM tok WHERE len(t) > 0
),
qtf AS (
  SELECT doc_id, term, COUNT(*) AS f
  FROM terms WHERE term IN ('spark', 'table', 'query')
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms
  WHERE term IN ('spark', 'table', 'query') GROUP BY term
),
contrib AS (
  SELECT q.doc_id,
         ln(1.0 + (n_docs - d.df + 0.5) / (d.df + 0.5))
           * (q.f * (1.2 + 1.0))
           / (q.f + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / avgdl)) AS part
  FROM qtf q
  JOIN dfreq d USING (term)
  JOIN doclen l USING (doc_id), stats
),
scored AS (SELECT doc_id, SUM(part) AS score FROM contrib GROUP BY doc_id)"""

RRF_K = 60
RRF_DEPTH = 100


@register(
    "q131_hybrid_rrf",
    doc="Hybrid retrieval with reciprocal rank fusion (Cormack et al. "
    "2009) — the standard RAG retrieval stage: a lexical BM25 ranking and "
    "a dense embedding-cosine ranking, each cut to its top-100 via "
    "distributed top-k (TakeOrderedAndProject, never a global sort), "
    "fused per doc as 1/(60+rank_lex) + 1/(60+rank_dense), top-20 out. "
    "Rank windows run over the bounded 100-row shortlists, not the "
    "corpus; docs on one list only contribute that list's term. BM25 "
    "formula shared with q67 (plans/q_datapipe.py::bm25_scores).",
    oracle="WITH "
    + _BM25_ORACLE_CTES
    + f""",
bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rb
  FROM (SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id ASC LIMIT {RRF_DEPTH})
),
qv AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
  FROM embeddings WHERE vec_id = 0
),
cosf AS (
  SELECT vec_id AS doc_id,
         list_cosine_similarity(
           list_transform(embedding, x -> CAST(x AS DOUBLE)), qv.q) AS c
  FROM embeddings, qv
),
cv AS (
  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id ASC) AS rc
  FROM (SELECT doc_id, c FROM cosf
        ORDER BY c DESC, doc_id ASC LIMIT {RRF_DEPTH})
),
fused AS (
  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         COALESCE(b.rb, 0) AS r_bm25, COALESCE(v.rc, 0) AS r_cos,
         COALESCE(1.0 / ({RRF_K} + b.rb), 0.0)
           + COALESCE(1.0 / ({RRF_K} + v.rc), 0.0) AS rrf
  FROM bm b FULL OUTER JOIN cv v ON v.doc_id = b.doc_id
)
SELECT doc_id, CAST(r_bm25 AS BIGINT) AS r_bm25, CAST(r_cos AS BIGINT) AS r_cos,
       ROUND(rrf + 5e-9, 6) AS rrf
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT 20""",
)
def q131_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.vector import cosine_similarity
    from tickerlake_spark.plans.q_datapipe import bm25_scores

    scored = bm25_scores(spark, sf_dir)
    w_b = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm = (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
        .select("doc_id", "score")
        .withColumn("rb", F.row_number().over(w_b))
        .drop("score")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    qvec = [
        float(x) for x in base.filter(F.col("doc_id") == 0).select("v").first()[0]
    ]
    q = F.lit(qvec).cast("array<double>")
    cosf = base.select("doc_id", cosine_similarity(F.col("v"), q).alias("c"))
    w_c = Window.orderBy(F.col("c").desc(), F.col("doc_id").asc())
    cv = (
        cosf.orderBy(F.col("c").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
        .withColumn("rc", F.row_number().over(w_c))
        .drop("c")
    )

    fused = bm.join(cv, ["doc_id"], "full").withColumn(
        "rrf",
        F.coalesce(1.0 / (RRF_K + F.col("rb")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("rc")), F.lit(0.0)),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(20)
        .select(
            "doc_id",
            F.coalesce("rb", F.lit(0)).cast("long").alias("r_bm25"),
            F.coalesce("rc", F.lit(0)).cast("long").alias("r_cos"),
            stable_round(F.col("rrf"), 6).alias("rrf"),
        )
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


def _mmr_oracle(n_short: int = 50, k: int = 10, lam: float = 0.7) -> str:
    """Unrolled MMR greedy-selection CTE chain: candidate shortlist with
    6dp-rounded similarities (the q45 cross-engine contract), pairwise sims,
    then k argmax steps each penalized by the max similarity to everything
    already selected."""
    parts = [_VVECS_CTE, _QV_CTE]
    parts.append(f"""cand AS MATERIALIZED (
  SELECT vec_id AS id, e,
         ROUND(list_cosine_similarity(e, qv.q) + 5e-9, 6) AS simq
  FROM vvecs, qv
  ORDER BY ROUND(list_cosine_similarity(e, qv.q) + 5e-9, 6) DESC, vec_id ASC
  LIMIT {n_short}
)""")
    parts.append("""psim AS MATERIALIZED (
  SELECT a.id AS a, b.id AS b,
         ROUND(list_cosine_similarity(a.e, b.e) + 5e-9, 6) AS sim
  FROM cand a JOIN cand b ON a.id <> b.id
)""")
    parts.append(f"""pick1 AS MATERIALIZED (
  SELECT id, {lam} * simq AS score FROM cand
  ORDER BY simq DESC, id ASC LIMIT 1
)""")
    parts.append("selu1 AS MATERIALIZED (SELECT id FROM pick1)")
    for t in range(2, k + 1):
        parts.append(f"""pick{t} AS MATERIALIZED (
  SELECT c.id, {lam} * c.simq - {1.0 - lam} * MAX(p.sim) AS score
  FROM cand c JOIN psim p ON p.a = c.id AND p.b IN (SELECT id FROM selu{t - 1})
  WHERE c.id NOT IN (SELECT id FROM selu{t - 1})
  GROUP BY c.id, c.simq
  ORDER BY score DESC, c.id ASC LIMIT 1
)""")
        parts.append(
            f"selu{t} AS MATERIALIZED (SELECT id FROM selu{t - 1} UNION ALL SELECT id FROM pick{t})"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {t} AS rank, id, score FROM pick{t}" for t in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, id, ROUND(score + 5e-9, 6) AS score
FROM ({sel}) ORDER BY rank ASC"""
    )


@register(
    "q138_mmr_rerank",
    doc="Maximal-Marginal-Relevance diversified top-10 (Carbonell & "
    "Goldstein 1998): greedy re-rank of the cosine top-50 shortlist, each "
    "pick maximizing lambda*sim(query, d) - (1-lambda)*max sim(d, "
    "selected). The distributed work is the corpus-wide shortlist scan; "
    "the k-step greedy selection is a single JVM ``aggregate`` fold over "
    "the collected-to-one-row shortlist array (VERDICT r8 item 7: no "
    "driver-side selection loop, no .collect() anywhere in the plan) — "
    "pairwise sims are evaluated inside the fold against the <=k picked "
    "embeddings, so the O(shortlist x k x dim) work stays in codegen. "
    "Similarities are 6dp-stable-rounded on both engines (q45's proven "
    "cross-engine contract) so the 10-step selection chain is "
    "value-hashable.",
    oracle=_mmr_oracle(),
)
def q138_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.vector import cosine_similarity

    lam, n_short, k = 0.7, 50, 10
    om = 1.0 - lam  # embed the exact double (0.30000000000000004)
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    qv = [float(x) for x in base.filter(F.col("id") == 0).select("e").first()[0]]
    q = F.lit(qv).cast("array<double>")
    cand = (
        base.select(
            "id", "e", stable_round(cosine_similarity(F.col("e"), q), 6).alias("simq")
        )
        .orderBy(F.col("simq").desc(), F.col("id").asc())
        .limit(n_short)
    )
    shortlist = cand.agg(F.collect_list(F.struct("id", "simq", "e")).alias("cs"))

    # same float ops as functions/vector.cosine_similarity, in SQL form so
    # it composes with the fold's lambda variables
    def _cos(a: str, b: str) -> str:
        def _dot(x: str, y: str) -> str:
            return (
                f"aggregate(zip_with({x}, {y}, (px, py) -> px * py), "
                "cast(0.0 as double), (acc, v) -> acc + v)"
            )

        def _nrm(x: str) -> str:
            return (
                f"sqrt(aggregate({x}, cast(0.0 as double), "
                "(acc, v) -> acc + v * v))"
            )

        return f"({_dot(a, b)} / ({_nrm(a)} * {_nrm(b)}))"

    # score of candidate c given already-picked set acc (simq and pairwise
    # sims both 6dp-stable-rounded, matching the oracle's psim CTE)
    score = (
        f"CASE WHEN size(acc) = 0 THEN {lam!r} * c.simq "
        f"ELSE {lam!r} * c.simq - {om!r} * array_max(transform(acc, "
        f"s -> round({_cos('c.e', 's.e')} + 5e-9, 6))) END"
    )
    state_t = "array<struct<rank:int,id:bigint,score:double,e:array<double>>>"
    pick_t = "struct<id:bigint,sc:double,e:array<double>>"
    argmax = f"""aggregate(
      transform(
        filter(cs, c -> NOT exists(acc, s -> s.id = c.id)),
        c -> named_struct('id', c.id, 'sc', {score}, 'e', c.e)
      ),
      cast(null as {pick_t}),
      (b, x) -> CASE WHEN b IS NULL OR x.sc > b.sc
                          OR (x.sc = b.sc AND x.id < b.id)
                     THEN x ELSE b END
    )"""
    fold = f"""aggregate(
      sequence(1, {k}),
      cast(array() as {state_t}),
      (acc, t) -> concat(acc, transform(array({argmax}),
        w -> named_struct('rank', cast(t as int), 'id', w.id,
                          'score', w.sc, 'e', w.e)))
    )"""
    return (
        shortlist.select(F.explode(F.expr(fold)).alias("s"))
        .select(
            F.col("s.rank").cast("long").alias("rank"),
            F.col("s.id").alias("id"),
            F.round(F.col("s.score") + F.lit(5e-9), 6).alias("score"),
        )
        .orderBy("rank")
    )


def _bpe_oracle_sql(n_merges: int = 10) -> str:
    """Unrolled cross-engine BPE oracle. The trick that makes the 'stateful
    list rewrite' SQL-expressible: encode each word's symbol array as a
    US-delimited string ``␟␟s1␟␟s2␟␟…␟␟`` (double separator between
    symbols). Greedy left-to-right non-overlapping merge of adjacent
    (a, b) — exactly ``operators/bpe.merge_pair_expr``'s fold semantics —
    is then plain ``replace(s, '␟a␟␟b␟', '␟ab␟')``: forward-scanning
    string replace never rescans its own output (so a freshly merged
    symbol can't re-merge in the same pass, matching the fold), the single
    separators flanking the pattern guarantee full-symbol matches, and the
    double outer separators survive as the neighbors' inner ones so
    consecutive pair occurrences all merge in one pass. Each of the
    n_merges iterations is one MATERIALIZED CTE hop (pair explode via
    lateral UNNEST + argmax + replace). The chain carries each word
    through, so ``v{{n}}``'s ``s`` column IS the trained tokenizer's
    segmentation of that word — q151's encode oracle reads it directly."""
    return _BPE_CHAIN + f"""
SELECT CAST(i AS BIGINT) AS merge_rank, a AS "left", b AS "right",
       n AS pair_freq
FROM ({_bpe_merge_union(n_merges)}) ORDER BY merge_rank"""


def _bpe_merge_union(n_merges: int) -> str:
    return "\n  UNION ALL ".join(
        f"SELECT {i} AS i, a, b, n FROM b{i}" for i in range(1, n_merges + 1)
    )


def _bpe_chain_sql(n_merges: int = 10) -> str:
    """The shared WITH chain: w (word, freq), v0..v{n} (word, freq, s),
    b1..b{n} (a, b, n) — see _bpe_oracle_sql for the replace trick."""
    sep = chr(31)  # US control char — cannot appear in \s+-split tokens
    ctes = [
        f"""w AS (
  SELECT w0 AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_TOK_SQL}) AS w0 FROM documents)
  WHERE w0 <> '' GROUP BY w0
),
v0 AS MATERIALIZED (
  SELECT word, freq, '{sep}{sep}' || array_to_string(
    list_append(regexp_extract_all(word, '.'), '</w>'), '{sep}{sep}')
    || '{sep}{sep}' AS s
  FROM w
)"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT syms[j] AS a, syms[j+1] AS b, CAST(SUM(freq) AS BIGINT) AS n
  FROM (SELECT freq, list_filter(string_split(s, '{sep}'), x -> x <> '') AS syms
        FROM v{i - 1}),
       UNNEST(range(1, len(syms))) AS t(j)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT a, b, n FROM p{i} ORDER BY n DESC, a ASC, b ASC LIMIT 1
),
v{i} AS MATERIALIZED (
  SELECT word, freq, replace(s, '{sep}' || a || '{sep}{sep}' || b || '{sep}',
                          '{sep}' || a || b || '{sep}') AS s
  FROM v{i - 1} CROSS JOIN b{i}
)"""
        )
    return "WITH " + ",\n".join(ctes)


_BPE_SEP = chr(31)
_BPE_CHAIN = _bpe_chain_sql(10)


@register(
    "q139_bpe_merges",
    doc="BPE tokenizer training (Sennrich 2016; operators/bpe.py): the "
    "first 10 learned byte-pair merges over the documents corpus, as "
    "(merge_rank, left, right, pair_freq). The corpus is scanned ONCE "
    "(word-frequency agg); every merge iteration then runs on the "
    "distinct-word table — pair explode + one map-side-combined hash agg "
    "+ a 1-row argmax + a JVM aggregate-fold apply (no Python UDF). "
    "Deterministic via the (freq desc, pair asc) tie-break. Cross-engine "
    "oracle: the 10 iterations are unrolled as MATERIALIZED CTEs, with "
    "the greedy merge-apply expressed as a delimiter-boundary string "
    "replace (see _bpe_oracle_sql) — plus exact parity with a pure-Python "
    "reference implementation in test_llm_operators.py.",
    oracle=_bpe_oracle_sql(10),
)
def q139_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=10)
    rows = [
        (i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank long, left string, right string, pair_freq long"
    ).orderBy("merge_rank")


@register(
    "q151_bpe_encode",
    doc="BPE tokenizer ENCODE path (the serving half of q139's training): "
    "apply the 10 learned merges to the 20 most frequent corpus words and "
    "emit each word's segmentation — chars+</w> folded through the merge "
    "list in order via operators/bpe.bpe_segment's JVM aggregate folds, "
    "map-side only. The oracle reuses q139's unrolled CTE chain: after "
    "the 10th merge hop, v10's delimited string IS the trained "
    "tokenizer's segmentation of every vocabulary word, so the encode "
    "result is read straight out of the training state — one source of "
    "truth for both halves.",
    oracle=_BPE_CHAIN
    + f"""
SELECT word, freq AS n, array_to_string(
    list_filter(string_split(s, '{_BPE_SEP}'), x -> x <> ''), ' ') AS pieces
FROM v10 ORDER BY n DESC, word ASC LIMIT 20""",
)
def q151_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
        word_frequencies,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=10)
    top = (
        word_frequencies(docs)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(20)
    )
    seg = bpe_segment(top, merges, word_col="word", out_col="syms")
    return seg.select(
        "word",
        F.col("freq").cast("long").alias("n"),
        F.array_join(F.col("syms"), " ").alias("pieces"),
    ).orderBy(F.col("n").desc(), F.col("word").asc())
