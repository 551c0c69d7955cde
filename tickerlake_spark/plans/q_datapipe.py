"""Training-data-pipeline queries, batch 2 (q66-q92): relevance scoring
(TF-IDF/BM25), stratified sampling, quality filtering, PII masking, exact
percentiles, embedding compression/centroids, dedup clustering (connected
components -> canonical keep), nearest-centroid assignment, event analytics
(funnel, cohorts, sessionization, rolling distinct, histogram, z-score,
profiling, sketches), and the classic decorrelation/join plan shapes
(argmax-per-group, Q6, Q8, Q17, Q18, Q19, Q21, Q22).

All hot paths are JVM expressions (whole-stage codegen); the only floats that
cross an aggregation boundary are rounded via ``stable_round`` on both
engines. Rankings order on full-precision scores WITHIN each engine and
tie-break on integer/string keys, so the selected row SET is deterministic
cross-engine (equal inputs produce bitwise-equal scores; mathematically
distinct scores differ by far more than the ulp-level libm drift).

Scale notes per query live in the docstrings — the common theme: everything
is a hash-shuffle on a key or a broadcast of a scalar/dim table; no driver
collects, no O(n^2) stages, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickerlake_spark.functions.core import stable_round
from tickerlake_spark.functions.text import h60, tokens
from tickerlake_spark.plans.catalog import load_table, register

_TOK_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"

# DuckDB mirror of functions.text.h60 (60-bit md5-prefix hash)
_H60_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Relevance scoring: TF-IDF and BM25
# ---------------------------------------------------------------------------


@register(
    "q66_tfidf_topterms",
    doc="TF-IDF top-3 terms per document (doc_id < 100), IDF over the full "
    "corpus. Plan: tokenize -> explode -> two hash aggs (term freq per doc, "
    "doc freq per term) -> broadcast the 1-row corpus count -> ranking "
    "window per doc. The explode shuffles (doc_id, term) pairs only, never "
    "document text; df and N are corpus-global but reduce to a broadcast "
    "join, so the plan is linear in total postings at 100 TB.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOK_SQL} AS t FROM documents
),
terms AS (
  SELECT doc_id, unnest(t) AS term, len(t) AS n FROM tok WHERE len(t) > 0
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS c, MAX(n) AS n
  FROM terms GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term
),
nd AS (SELECT COUNT(*) AS n_docs FROM tok WHERE len(t) > 0),
scored AS (
  SELECT f.doc_id, f.term, f.c, d.df,
         (CAST(f.c AS DOUBLE) / f.n)
           * (ln((n_docs + 1.0) / (d.df + 1.0)) + 1.0) AS score
  FROM tf f JOIN dfreq d USING (term), nd
  WHERE f.doc_id < 100
)
SELECT doc_id, term, c AS term_count, df AS doc_freq,
       ROUND(score + 5e-9, 6) AS tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rn
  FROM scored
) WHERE rn <= 3
""",
)
def q66_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", tokens("text").alias("t")).filter(F.size("t") > 0)
    terms = tok.select(
        "doc_id", F.explode("t").alias("term"), F.size("t").alias("n")
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").alias("c"), F.max("n").alias("n")
    )
    dfreq = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nd = tok.agg(F.count("*").alias("n_docs"))
    score = (F.col("c").cast("double") / F.col("n")) * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("score", score)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("c").alias("term_count"),
            F.col("df").alias("doc_freq"),
            stable_round(F.col("score"), 6).alias("tfidf"),
        )
    )


_BM25_TERMS = ("spark", "table", "query")
_K1, _B = 1.2, 0.75


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score): BM25 of the corpus for the fixed 3-term query —
    shared by q67 (direct ranking) and q131 (hybrid RRF fusion)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", tokens("text").alias("t")).filter(F.size("t") > 0)
    doclen = tok.select("doc_id", F.size("t").alias("dl"))
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    terms = tok.select("doc_id", F.explode("t").alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    qtf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("f"))
    dfreq = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    part = (
        F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("f") * (_K1 + 1.0))
        / (F.col("f") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    return (
        qtf.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("part", part)
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )



@register(
    "q67_bm25_rank",
    doc="BM25 (k1=1.2, b=0.75) ranking of the corpus for a 3-term query; "
    "top 50 docs. Same linear postings plan as q66: the per-term df and the "
    "corpus (N, avgdl) scalars broadcast; only docs containing a query term "
    "ever leave the scan (predicate on the exploded term), so at 100 TB the "
    "score aggregation touches the inverted-index slice, not the corpus.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOK_SQL} AS t FROM documents
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
           * (q.f * ({_K1} + 1.0))
           / (q.f + {_K1} * (1.0 - {_B} + {_B} * l.dl / avgdl)) AS part
  FROM qtf q
  JOIN dfreq d USING (term)
  JOIN doclen l USING (doc_id), stats
),
scored AS (SELECT doc_id, SUM(part) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, ROUND(score + 5e-9, 6) AS bm25
FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= 50
""",
)
def q67_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = bm25_scores(spark, sf_dir)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("doc_id", stable_round(F.col("score"), 6).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# Sampling / quality / PII
# ---------------------------------------------------------------------------


@register(
    "q68_stratified_sample",
    doc="Deterministic stratified sampling: per-language rates (en 10%, "
    "de 20%, others 50%) via h60(doc key) mod 100 — a pure map-side filter, "
    "reproducible across engines and runs (the scalable replacement for "
    "rand()-based sampling; cf. the reference's unseeded shuffle sample, "
    "silver/validation.py:142-145). Zero shuffles: the filter composes with "
    "scan pushdown and the output is the kept rows themselves.",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(concat('0x', substr(md5(concat('strat-', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 20 ELSE 50 END
""",
)
def q68_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang") == "de", 20)
        .otherwise(50)
    )
    bucket = F.pmod(h60(F.concat(F.lit("strat-"), F.col("doc_id").cast("string"))), F.lit(100))
    return d.filter(bucket < rate).select("doc_id", "lang", "source")


@register(
    "q69_quality_filter",
    doc="Gopher-style document quality rules: word-count bounds, mean word "
    "length, punctuation ratio, stopword evidence — each a flag plus the "
    "underlying metric, and a conjunctive keep. All row-local array/string "
    "expressions: no shuffle at all, runs at scan speed over 100 TB.",
    oracle="""
WITH m AS (
  SELECT doc_id,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_words,
         CAST(list_aggregate(list_transform(
             regexp_split_to_array(lower(trim(text)), '\\s+'),
             x -> len(x)), 'sum') AS DOUBLE)
           / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS mwl,
         CAST(len(text) - len(regexp_replace(text, '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
           / len(text) AS punct_ratio,
         len(list_intersect(
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
             ['the', 'a', 'of', 'and', 'to'])) AS stop_hits
  FROM documents WHERE len(text) > 0
)
SELECT doc_id, n_words,
       ROUND(mwl + 5e-9, 6) AS mean_word_len,
       ROUND(punct_ratio + 5e-9, 6) AS punct_ratio,
       stop_hits,
       (n_words BETWEEN 10 AND 100000) AS ok_words,
       (mwl >= 2.0 AND mwl <= 12.0) AS ok_word_len,
       (punct_ratio <= 0.2) AS ok_punct,
       (stop_hits >= 1) AS ok_stop,
       (n_words BETWEEN 10 AND 100000 AND mwl >= 2.0 AND mwl <= 12.0
        AND punct_ratio <= 0.2 AND stop_hits >= 1) AS keep
FROM m
""",
)
def q69_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import PUNCT_CLASS

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = tokens("text")
    n_words = F.size(t)
    mwl = (
        F.aggregate(
            F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("double")
        / n_words
    )
    punct_ratio = (
        (F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))).cast(
            "double"
        )
        / F.length("text")
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(t), F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "to"]])
        )
    )
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mwl"),
        punct_ratio.alias("punct_ratio"),
        stop_hits.alias("stop_hits"),
    )
    ok_words = F.col("n_words").between(10, 100000)
    ok_word_len = (F.col("mwl") >= 2.0) & (F.col("mwl") <= 12.0)
    ok_punct = F.col("punct_ratio") <= 0.2
    ok_stop = F.col("stop_hits") >= 1
    return m.select(
        "doc_id",
        "n_words",
        stable_round(F.col("mwl"), 6).alias("mean_word_len"),
        stable_round(F.col("punct_ratio"), 6).alias("punct_ratio"),
        "stop_hits",
        ok_words.alias("ok_words"),
        ok_word_len.alias("ok_word_len"),
        ok_punct.alias("ok_punct"),
        ok_stop.alias("ok_stop"),
        (ok_words & ok_word_len & ok_punct & ok_stop).alias("keep"),
    )


@register(
    "q70_pii_mask",
    doc="PII detection/redaction shapes: synthesize deterministic phone + "
    "email strings from customer keys (the driver tables carry no real "
    "PII), then mask all but the last 4 phone digits and all but the first "
    "email-local char. Pure row-local regex/string ops — scan-speed "
    "scrubbing, the standard pre-training redaction pass.",
    oracle="""
WITH pii AS (
  SELECT c_custkey,
         CAST(c_custkey % 900 + 100 AS VARCHAR) || '-'
           || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') AS phone,
         lower(replace(c_name, '#', '')) || '@example.com' AS email
  FROM customer WHERE c_custkey < 500
)
SELECT c_custkey, phone,
       regexp_replace(substr(phone, 1, len(phone) - 4), '[0-9]', '*', 'g')
         || substr(phone, len(phone) - 3, 4) AS masked_phone,
       email,
       substr(split_part(email, '@', 1), 1, 1)
         || repeat('*', len(split_part(email, '@', 1)) - 1)
         || '@' || split_part(email, '@', 2) AS masked_email
FROM pii
""",
)
def q70_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    phone = F.concat(
        (F.col("c_custkey") % 900 + 100).cast("string"),
        F.lit("-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
    )
    email = F.concat(
        F.lower(F.regexp_replace("c_name", "#", "")), F.lit("@example.com")
    )
    pii = c.select("c_custkey", phone.alias("phone"), email.alias("email"))
    local = F.substring_index("email", "@", 1)
    domain = F.substring_index("email", "@", -1)
    masked_phone = F.concat(
        F.regexp_replace(
            F.expr("substr(phone, 1, length(phone) - 4)"), "[0-9]", "*"
        ),
        F.expr("substr(phone, length(phone) - 3, 4)"),
    )
    masked_email = F.concat(
        F.substring(local, 1, 1),
        F.expr("repeat('*', length(substring_index(email, '@', 1)) - 1)"),
        F.lit("@"),
        domain,
    )
    return pii.select(
        "c_custkey",
        "phone",
        masked_phone.alias("masked_phone"),
        "email",
        masked_email.alias("masked_email"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles
# ---------------------------------------------------------------------------


@register(
    "q71_percentiles_exact",
    doc="Exact linear-interpolated percentiles (p25/p50/p75/p95) of "
    "extended price per return flag — Spark's `percentile` aggregate vs "
    "DuckDB's quantile_cont. Exact percentiles need the full value "
    "multiset per group (that's inherent); per-group state is the sorted "
    "digest, and groups are few — for streaming/huge-cardinality cases "
    "approx_percentile is the scale path.",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25) + 5e-9, 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50) + 5e-9, 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75) + 5e-9, 6) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.95) + 5e-9, 6) AS p95,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q71_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))")
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"), F.count("*").alias("n"))
        .select(
            "l_returnflag",
            stable_round(F.element_at("p", 1), 6).alias("p25"),
            stable_round(F.element_at("p", 2), 6).alias("p50"),
            stable_round(F.element_at("p", 3), 6).alias("p75"),
            stable_round(F.element_at("p", 4), 6).alias("p95"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Embedding compression / centroids
# ---------------------------------------------------------------------------


@register(
    "q72_embedding_quantize",
    doc="Symmetric int8 quantization of embeddings: per-vector scale = "
    "127/max|x|, q_i = clamp(floor(x*scale + .5)) — explicit floor(+0.5) "
    "so both engines round identically. Reports the reconstruction L2 "
    "error and the int checksum. Row-local array math (zip_with/aggregate) "
    "— zero shuffle; this is the 4x storage cut before ANN indexing. "
    "scale/l2_err are emitted in integer micro-units (x1e6, BIGINT) so no "
    "float output can sit near a decimal rounding boundary across engines.",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         list_aggregate(list_transform(e, x -> abs(x)), 'max') AS amax
  FROM v
),
sc AS (
  SELECT vec_id, e,
         CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
  FROM s
),
q AS (
  SELECT vec_id, e, scale,
         list_transform(e, x ->
           CAST(greatest(-127.0, least(127.0, floor(x * scale + 0.5))) AS BIGINT)) AS qv
  FROM sc
)
SELECT vec_id,
       CAST(floor(scale * 1e6 + 0.5) AS BIGINT) AS scale_e6,
       CAST(floor(sqrt(list_aggregate(
         list_transform(range(1, len(e) + 1),
                        i -> (e[i] - qv[i] / scale) * (e[i] - qv[i] / scale)),
         'sum')) * 1e6 + 0.5) AS BIGINT) AS l2_err_e6,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_checksum
FROM q
""",
)
def q72_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.vector import as_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", as_double_array("embedding").alias("e"))
    amax = F.aggregate(
        F.transform("e", lambda x: F.abs(x)), F.lit(0.0), lambda a, x: F.greatest(a, x)
    )
    s = v.withColumn("scale", F.when(amax > 0, 127.0 / amax).otherwise(F.lit(1.0)))
    qv = F.transform(
        "e",
        lambda x: F.greatest(
            F.lit(-127.0), F.least(F.lit(127.0), F.floor(x * F.col("scale") + 0.5))
        ).cast("long"),
    )
    q = s.withColumn("qv", qv)
    err2 = F.aggregate(
        F.zip_with(
            "e",
            "qv",
            lambda x, qq: (x - qq / F.col("scale")) * (x - qq / F.col("scale")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return q.select(
        "vec_id",
        F.floor(F.col("scale") * 1e6 + 0.5).cast("long").alias("scale_e6"),
        F.floor(F.sqrt(err2) * 1e6 + 0.5).cast("long").alias("l2_err_e6"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_checksum"
        ),
    )


@register(
    "q73_label_centroids",
    doc="Per-label centroid of the embedding space, one output row per "
    "(label, dimension): posexplode -> hash agg on (label, pos). The "
    "explode shuffles (label, pos, value) triples — 64x the row count but "
    "24 bytes each, and partial aggregation runs map-side, so the exchange "
    "carries ~n_labels*dim rows per task. The per-label k-means seed step "
    "at corpus scale.",
    oracle="""
WITH idx AS (SELECT unnest(range(1, 65)) AS i),
ev AS (
  SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN idx
)
SELECT label, pos, ROUND(AVG(val) + 5e-9, 6) AS centroid_val, COUNT(*) AS n
FROM ev GROUP BY label, pos
""",
)
def q73_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.vector import as_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.select(
        "label", F.posexplode(as_double_array("embedding")).alias("pos", "val")
    )
    return ev.groupBy("label", "pos").agg(
        stable_round(F.avg("val"), 6).alias("centroid_val"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Classic plan shapes: decorrelated min-per-group, having, market share
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Dedup clustering: pairs -> connected components -> canonical keep
# ---------------------------------------------------------------------------

_CC_EDGES_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100
),
dup_edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM corpus a JOIN corpus b
    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
),
chain_edges AS (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents WHERE doc_id < 20
),
edges AS (SELECT * FROM dup_edges UNION SELECT * FROM chain_edges),
sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION SELECT dst AS a, src AS b FROM edges
)"""

_CC_CLOSURE_SQL = f"""
WITH RECURSIVE {_CC_EDGES_SQL},
reach(node, lbl) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, r.lbl FROM sym s JOIN reach r ON s.b = r.node
),
components AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
)"""


def _cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.graph import connected_components

    corpus = _cc_corpus(spark, sf_dir)
    a = corpus.select(F.col("doc_id").alias("ida"), F.md5("text").alias("h"))
    b = corpus.select(F.col("doc_id").alias("idb"), F.md5("text").alias("h"))
    dup_edges = (
        a.join(b, "h")
        .filter(F.col("ida") < F.col("idb"))
        .select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
    )
    chain = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
    )
    edges = dup_edges.union(chain).distinct()
    return connected_components(edges, "src", "dst")


def _cc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(dup)


@register(
    "q78_connected_components",
    doc="Connected components over the duplicate-similarity graph "
    "(exact-dup pairs on a corpus with 100 injected copies, plus a 21-node "
    "chain exercising multi-hop label propagation). Spark: iterative "
    "min-label propagation, one join+agg per iteration, lineage truncated "
    "via localCheckpoint (operators/graph.py — the transitive-closure step "
    "every pair-emitting dedup needs). Oracle: DuckDB recursive CTE "
    "closure. Output label = min reachable id per node.",
    oracle=f"""
{_CC_CLOSURE_SQL}
SELECT node, component FROM components
""",
)
def q78_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cc_components(spark, sf_dir)


@register(
    "q79_dedup_canonical",
    doc="Canonical-keep decision per duplicate cluster: component label, "
    "member count, kept (min-id) document. The terminal step of the dedup "
    "pipeline — one hash-agg over the component table.",
    oracle=f"""
{_CC_CLOSURE_SQL}
SELECT component, COUNT(*) AS n_members, MIN(node) AS keep_node
FROM components GROUP BY component
""",
)
def q79_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.graph import canonical_per_component

    return canonical_per_component(_cc_components(spark, sf_dir))


@register(
    "q80_nearest_centroid",
    doc="Nearest-centroid assignment (one k-means E-step): per-label "
    "centroids (rounded to 6dp on both engines so distances are computed "
    "from identical inputs), then each vector joins ALL centroids via "
    "broadcast (k rows) and takes argmin L2 — a map-side broadcast "
    "nested-loop, the scalable assignment plan (no shuffle of the vector "
    "table). Distance folds run in index order on both engines, so "
    "results are bitwise-comparable; ties break on label asc.",
    oracle="""
WITH idx AS (SELECT unnest(range(1, 65)) AS i),
ev AS (
  SELECT vec_id, label AS true_label, i - 1 AS pos,
         CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN idx
),
cent AS (
  SELECT true_label AS clabel, pos, ROUND(AVG(val) + 5e-9, 6) AS cval
  FROM ev GROUP BY true_label, pos
),
cvecs AS (
  SELECT clabel, list(cval ORDER BY pos) AS cvec FROM cent GROUP BY clabel
),
vvecs AS (
  SELECT vec_id, label AS true_label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
dists AS (
  SELECT v.vec_id, v.true_label, c.clabel,
         list_aggregate(
           list_transform(range(1, 65),
                          i -> (v.e[i] - c.cvec[i]) * (v.e[i] - c.cvec[i])),
           'sum') AS d2
  FROM vvecs v CROSS JOIN cvecs c
)
SELECT vec_id, clabel AS assigned_label,
       ROUND(sqrt(d2) + 5e-9, 6) AS dist,
       (clabel = true_label) AS is_correct
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2 ASC, clabel ASC) AS rn
  FROM dists
) WHERE rn = 1
""",
)
def q80_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.vector import as_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode(as_double_array("embedding")).alias("pos", "val"),
    )
    cent = ev.groupBy(F.col("true_label").alias("clabel"), F.col("pos")).agg(
        stable_round(F.avg("val"), 6).alias("cval")
    )
    cvecs = cent.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda x: x.cval
        ).alias("cvec")
    )
    vvecs = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        as_double_array("embedding").alias("e"),
    )
    d2 = F.aggregate(
        F.zip_with("e", "cvec", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dists = vvecs.crossJoin(F.broadcast(cvecs)).withColumn("d2", d2)
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("clabel").asc())
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("clabel").alias("assigned_label"),
            stable_round(F.sqrt("d2"), 6).alias("dist"),
            (F.col("clabel") == F.col("true_label")).alias("is_correct"),
        )
    )


@register(
    "q84_small_qty_revenue",
    doc="TPC-H Q17 shape: scalar correlated subquery (per-part average "
    "quantity) decorrelated into a groupBy + join-back — the rewrite "
    "Catalyst cannot skip and the only scalable form at 100 TB. The "
    "threshold comparison is deterministic cross-engine: integer-valued "
    "quantities sum exactly in doubles, so 0.2*avg is bitwise identical.",
    oracle="""
WITH pa AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0 + 5e-7, 4) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
WHERE l.l_quantity < pa.threshold
""",
)
def q84_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("threshold")
    )
    return (
        li.join(pa.withColumnRenamed("l_partkey", "pk"), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            stable_round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q85_late_supplier_blame",
    doc="TPC-H Q21 shape (EXISTS + NOT EXISTS) adapted to the available "
    "columns: per supplier, count orders where this supplier shipped late "
    "(> 60 days after order date), at least one other supplier was on the "
    "order, and no other supplier was late. Decorrelated into per-order "
    "supplier/late-supplier counts — two hash-aggs replacing correlated "
    "per-row subqueries; the exists/not-exists pair becomes integer "
    "predicates on the counts.",
    oracle="""
WITH ls AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(*) AS n_supps,
         SUM(is_late) AS n_late
  FROM ls GROUP BY l_orderkey
)
SELECT s.s_name, ls.l_suppkey AS suppkey, COUNT(*) AS numwait
FROM ls
JOIN per_order p ON p.l_orderkey = ls.l_orderkey
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ls.is_late = 1 AND p.n_supps > 1 AND p.n_late = 1
GROUP BY s.s_name, ls.l_suppkey
""",
)
def q85_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    ls = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = ls.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count("*").alias("n_supps"), F.sum("is_late").alias("n_late")
    )
    return (
        ls.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("is_late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name", F.col("l_suppkey").alias("suppkey"))
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q86_trailing_active_users",
    doc="Rolling 7-day distinct active users per day (the WAU curve). "
    "COUNT DISTINCT over a sliding window isn't a window-function in either "
    "engine; the scalable exact plan is: reduce to the (user, day) grain "
    "first (one hash-agg, the big shrink), then a bounded range join day -> "
    "[day-6, day] and a countDistinct per day. The range join fans each "
    "(user, day) row out 7x — bounded, unlike a naive per-day self-join.",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day, COUNT(DISTINCT u.user_id) AS active_users_7d
FROM days d
JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
""",
)
def q86_trailing_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    u = ud.select(F.col("user_id"), F.col("day").alias("uday"))
    return (
        days.join(
            u,
            (F.col("uday") >= F.date_sub(F.col("day"), 6))
            & (F.col("uday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


@register(
    "q87_value_histogram",
    doc="Fixed-width 20-bucket histogram of event values: global min/max "
    "reduce to a broadcast scalar, bucket assignment is a map-side floor "
    "expression, then one hash-agg on bucket id. The two-pass shape "
    "(bounds, then bin) is the exact-histogram plan at any scale; "
    "single-pass approximations swap in approx_percentile sketches.",
    oracle="""
WITH bounds AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events WHERE value IS NOT NULL
),
binned AS (
  SELECT LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INTEGER), 19) AS bucket,
         lo, hi
  FROM events, bounds WHERE value IS NOT NULL
)
SELECT bucket,
       ROUND(lo + bucket * ((hi - lo) / 20.0) + 5e-9, 6) AS bucket_lo,
       COUNT(*) AS n
FROM binned GROUP BY bucket, lo, hi
""",
)
def q87_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / width).cast("int"), F.lit(19)
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "lo", "hi")
        .groupBy("bucket", "lo", "hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            stable_round(F.col("lo") + F.col("bucket") * width, 6).alias("bucket_lo"),
            "n",
        )
    )


@register(
    "q88_zscore_normalize",
    doc="Per-group z-score normalization (feature scaling): event values "
    "standardized within their event_type using the sample stddev. "
    "Group stats reduce to a tiny broadcast table; the normalization "
    "itself is a map-side expression — the standard scalable "
    "fit-then-transform split.",
    oracle="""
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - s.mu) / s.sigma + 5e-9, 6) AS zscore
FROM events e JOIN stats s USING (event_type)
WHERE e.value IS NOT NULL AND s.sigma > 0
""",
)
def q88_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        ev.join(F.broadcast(stats), F.col("event_type") == F.col("et"))
        .filter(F.col("sigma") > 0)
        .select(
            "event_id",
            "event_type",
            stable_round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias(
                "zscore"
            ),
        )
    )


@register(
    "q89_column_profile",
    doc="Data-profiling operator: per-column null count, distinct count, "
    "and min/max (stringified) for the documents table — the A10/A11 "
    "data-quality family generalized to a whole-table profile. One pass "
    "per aggregate set; every stat is a plain hash-agg, so profiling cost "
    "is one scan regardless of table width.",
    oracle="""
SELECT 'doc_id' AS col_name,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_val,
       CAST(MAX(doc_id) AS VARCHAR) AS max_val
FROM documents
UNION ALL
SELECT 'lang',
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT lang),
       MIN(lang), MAX(lang)
FROM documents
UNION ALL
SELECT 'source',
       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT source),
       MIN(source), MAX(source)
FROM documents
UNION ALL
SELECT 'n_chars',
       CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT n_chars),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
FROM documents
""",
)
def q89_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    def profile(col: str) -> DataFrame:
        return d.agg(
            F.lit(col).alias("col_name"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        )

    out = profile("doc_id")
    for c in ("lang", "source", "n_chars"):
        out = out.unionByName(profile(c))
    return out


@register(
    "q90_approx_stats",
    doc="Sketch-based statistics per event_type, both CROSS-ENGINE "
    "verifiable: approximate distinct users via a KMV (k-minimum-values) "
    "sketch (operators/incremental_agg.py — exact below k=2048, else "
    "(k-1)*2^60/h_(k); ~2.2% rsd) and approximate value quantiles via a "
    "fixed-grid histogram (cell width 0.25 -> error bound +-0.25 on the "
    "quantile VALUE; cell-midpoint emitted). These are the single-pass, "
    "bounded-memory scale path for q08 (exact distinct) and q71 (exact "
    "percentiles): per-group state is O(k) / O(cells) regardless of "
    "cardinality and both sketches merge associatively across partitions. "
    "Unlike engine-internal HLL/KLL binary states, every step (hash, "
    "rank, integer cumulative counts, one IEEE division) is portable SQL, "
    "so the DuckDB oracle reproduces the estimates bit-for-bit — this "
    "query was rows-only in rounds 1-4 precisely because "
    "approx_count_distinct/percentile_approx cannot be mirrored.",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type, {_H60_SQL.format(x="CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
kmv AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h) WHERE rn <= 2048
),
users AS (
  SELECT event_type,
         CAST(CASE WHEN COUNT(*) < 2048 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE ROUND(2047.0 / MAX(h) * 1152921504606846976.0) END
              AS BIGINT) AS approx_users
  FROM kmv GROUP BY event_type
),
cells AS (
  SELECT event_type, CAST(floor(value * 4.0) AS BIGINT) AS cell,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cell, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY cell) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM cells
),
q AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= 0.5 * n THEN cell END) AS c50,
         MIN(CASE WHEN cum >= 0.95 * n THEN cell END) AS c95,
         CAST(MAX(n) AS BIGINT) AS n
  FROM cum GROUP BY event_type
)
SELECT q.event_type, u.approx_users,
       ROUND((c50 + 0.5) * 0.25 + 5e-9, 6) AS approx_p50,
       ROUND((c95 + 0.5) * 0.25 + 5e-9, 6) AS approx_p95,
       q.n
FROM q JOIN users u ON u.event_type = q.event_type
ORDER BY q.event_type
""",
)
def q90_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.incremental_agg import kmv_delta, kmv_estimates

    ev = load_table(spark, sf_dir, "events")
    users = kmv_estimates(
        kmv_delta(ev, ["event_type"], "user_id", k=2048),
        ["event_type"],
        k=2048,
        out="approx_users",
    )
    cells = ev.groupBy(
        "event_type", F.floor(F.col("value") * 4.0).cast("long").alias("cell")
    ).agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy("event_type").orderBy("cell")
    w_all = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "cell",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    qcell = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= 0.5 * F.col("n"), F.col("cell"))).alias("c50"),
        F.min(F.when(F.col("cum") >= 0.95 * F.col("n"), F.col("cell"))).alias("c95"),
        F.max("n").cast("long").alias("n"),
    )
    return (
        qcell.join(users, "event_type")
        .select(
            "event_type",
            "approx_users",
            stable_round((F.col("c50") + 0.5) * 0.25, 6).alias("approx_p50"),
            stable_round((F.col("c95") + 0.5) * 0.25, 6).alias("approx_p95"),
            "n",
        )
        .orderBy("event_type")
    )


@register(
    "q133_hll_incremental_distinct",
    doc="Persisted-sketch distinct maintenance (the merge path of q90's "
    "one-shot sketch): per-(event_type, date) KMV sketches are built as "
    "if landing daily, then merged associatively (union -> distinct -> "
    "re-rank <= k) into per-event_type approximate distinct-user counts — "
    "history never rescans; each refresh sketches only the new day and "
    "merges O(k) state. KMV replaced the engine-internal HLL binary "
    "state in round 5 so the WHOLE chain (hash, daily rank, merge, "
    "estimate) is portable SQL and the DuckDB oracle verifies it "
    "bit-for-bit — this query was rows-only in rounds 1-4. The "
    "HLL-vs-KMV merge-equality property (incremental == one-shot) is "
    "additionally gated in test_scale_operators.py; the binary-HLL "
    "variant remains in operators/incremental_agg.py and streaming/"
    "sketch_rollup.py for purely-Spark rollups.",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS d,
         {_H60_SQL.format(x="CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
daily AS (
  SELECT event_type, d, h FROM (
    SELECT event_type, d, h,
           row_number() OVER (PARTITION BY event_type, d ORDER BY h) AS rn
    FROM h) WHERE rn <= 2048
),
merged AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM (SELECT DISTINCT event_type, h FROM daily)) WHERE rn <= 2048
),
est AS (
  SELECT event_type,
         CAST(CASE WHEN COUNT(*) < 2048 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE ROUND(2047.0 / MAX(h) * 1152921504606846976.0) END
              AS BIGINT) AS approx_users
  FROM merged GROUP BY event_type
)
SELECT e.event_type, e.approx_users, nd.n_days
FROM est e
JOIN (SELECT event_type, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type) nd
  ON nd.event_type = e.event_type
ORDER BY e.event_type
""",
)
def q133_hll_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.incremental_agg import (
        kmv_delta,
        kmv_estimates,
        kmv_merge,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "d", F.to_date(F.col("ts"))
    )
    daily = kmv_delta(ev, ["event_type", "d"], "user_id", k=2048)
    merged = kmv_merge(
        daily.select("event_type", "h").limit(0), daily, ["event_type"], k=2048
    )
    return (
        kmv_estimates(merged, ["event_type"], k=2048, out="approx_users")
        .join(
            daily.groupBy("event_type").agg(
                F.countDistinct("d").alias("n_days")
            ),
            "event_type",
        )
        .select("event_type", "approx_users", "n_days")
        .orderBy("event_type")
    )


@register(
    "q91_disjunctive_predicates",
    doc="TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning "
    "both join sides (brand x size x quantity bands). Catalyst extracts the "
    "common p_partkey equi-condition so the join stays a hash join with the "
    "disjunction as a post-join filter, and pushes the per-side conjuncts "
    "(brand/size, quantity) down to each scan.",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def q91_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(band).agg(
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q92_idle_rich_customers",
    doc="TPC-H Q22 shape: customers with above-average account balance and "
    "no high-value order (> 450k) — a scalar aggregate (broadcast 1-row), "
    "a filter, and a left-anti join against the filtered orders, grouped "
    "by nation. The anti join is the decorrelated NOT EXISTS; the scalar "
    "avg broadcast replaces the correlated subquery re-evaluation.",
    oracle="""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(*) AS n_custs,
       ROUND(SUM(c.c_acctbal) + 5e-7, 4) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
GROUP BY c.c_nationkey
""",
)
def q92_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_totalprice") > 450000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            stable_round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Event analytics: funnel, cohort retention, batch sessionization
# ---------------------------------------------------------------------------


@register(
    "q81_funnel_conversion",
    doc="Ordered funnel (view -> click -> purchase): per user, the first "
    "view, the first click AFTER that view, the first purchase AFTER that "
    "click, and the stage reached. Three filtered min-aggs chained by "
    "time-constrained joins — each stage's table shrinks, and every join "
    "key is user_id, so one user-hash partitioning serves the whole chain.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
         + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS reached_stage
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
""",
)
def q81_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.when(F.col("t_click").isNull(), 0).otherwise(1)
                + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
            ).alias("reached_stage"),
        )
    )


@register(
    "q82_cohort_retention",
    doc="Weekly cohort retention: cohort = Monday-truncated week of a "
    "user's first event; one output row per (cohort, week_offset) with the "
    "distinct users active that week. Two hash-aggs on user_id + one on "
    "the (cohort, offset) pair — the user-grain tables are tiny relative "
    "to the event log, standard retention shape at any scale.",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER) AS week_offset,
       COUNT(*) AS n_users
FROM first_seen f JOIN activity a USING (user_id)
GROUP BY f.cohort_week, week_offset
""",
)
def q82_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "q83_batch_sessionize",
    doc="Batch sessionization with a 30-minute inactivity gap "
    "(gaps-and-islands: lag + cumulative gap count over the user window — "
    "same pattern as the stair-step miner, reference metadata.json:189-334)."
    " One user-hash window; per-session rollup reuses the partitioning. "
    "The batch complement of the streaming session_window (q62).",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC)
              AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       date_diff('second', MIN(ts), MAX(ts)) AS duration_sec
FROM sessions GROUP BY user_id, session_seq
""",
)
def q83_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wcum = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    as_epoch = lambda c: c.cast("timestamp").cast("long")
    gap = as_epoch(F.col("ts")) - as_epoch(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0),
    )
    sessions = marked.withColumn("session_seq", F.sum("new_session").over(wcum))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        (F.max("ts").cast("timestamp").cast("long")
         - F.min("ts").cast("timestamp").cast("long")).alias("duration_sec"),
    )


@register(
    "q74_top_supplier_per_part",
    doc="Decorrelated per-group argmax with join-back (TPC-H Q2's shape on "
    "the available tables): per part, the supplier with the highest total "
    "shipped quantity; ranking key (total_qty DESC, suppkey ASC) is all-"
    "integer, so cross-engine deterministic. One agg shuffle on (partkey, "
    "suppkey), one ranking window on partkey, dims broadcast.",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem WHERE l_partkey < 1000
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
                               ORDER BY total_qty DESC, l_suppkey ASC) AS rn
  FROM ps
)
SELECT b.l_partkey AS partkey, p.p_name, b.l_suppkey AS suppkey, s.s_name,
       b.total_qty
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.l_suppkey
WHERE b.rn = 1
""",
)
def q74_top_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 1000)
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("total_qty")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("total_qty").desc(), F.col("l_suppkey").asc()
    )
    best = ps.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "p_name",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "total_qty",
        )
    )


@register(
    "q75_revenue_filter_agg",
    doc="TPC-H Q6 shape: tight filter -> single global agg. The whole "
    "query is a map-side partial sum + 1-row exchange; the three "
    "predicates all push to the parquet scan.",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount) + 5e-7, 4) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q75_revenue_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@register(
    "q76_large_orders",
    doc="TPC-H Q18 shape: groupBy-HAVING on the fact, then join back to "
    "orders + customer. The having-filtered orderkey set is small, so AQE "
    "turns the join-back into a broadcast at runtime; the only big shuffle "
    "is the orderkey agg.",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q76_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
    )


@register(
    "q77_market_share",
    doc="TPC-H Q8 shape: supplier-nation market share within a customer "
    "region, by order year. Six-table join where every dimension chain "
    "(supplier->nation, customer->nation->region) broadcasts; the fact "
    "shuffles once for the year agg. Share = conditional sum / total sum.",
    oracle="""
SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN ns.n_name = 'NATION_7'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-9, 6) AS mkt_share,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7, 4) AS total_revenue
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
JOIN region r    ON r.r_regionkey = nc.n_regionkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
WHERE r.r_name = 'EUROPE'
GROUP BY EXTRACT(year FROM o.o_orderdate)
""",
)
def q77_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    nc = n.alias("nc")
    ns = n.alias("ns")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("nc.n_nationkey") == F.col("c_nationkey"))
        .join(
            F.broadcast(r),
            (F.col("r_regionkey") == F.col("nc.n_regionkey"))
            & (F.col("r_name") == "EUROPE"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns.n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.withColumn("rev", rev)
        .withColumn(
            "nation_rev",
            F.when(F.col("ns.n_name") == "NATION_7", F.col("rev")).otherwise(F.lit(0.0)),
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            stable_round(F.sum("nation_rev") / F.sum("rev"), 6).alias("mkt_share"),
            stable_round(F.sum("rev"), 4).alias("total_revenue"),
        )
    )


@register(
    "q135_duplicate_spans",
    doc="Exact duplicated-span detection (the core of substring-level "
    "training-data dedup, Lee et al. 2022 style): word 8-grams appearing "
    "in >= 2 distinct documents of a corpus with 100 injected exact "
    "copies, top-100 by (doc count desc, span asc). Plan: map-side "
    "shingle explode -> ONE hash agg on the span string (the shuffle "
    "carries distinct (span, doc) rows, never document text) -> "
    "TakeOrderedAndProject. At 100 TB the span strings would be rolling "
    "hashes (64-bit) instead of text — same plan shape, 8x narrower "
    "shuffle rows.",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100
),
tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM corpus
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 6),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
  FROM tok WHERE len(t) >= 8
),
spans AS (
  SELECT g AS span, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM (SELECT doc_id, unnest(s) AS g FROM sh)
  GROUP BY g HAVING COUNT(*) >= 2
)
SELECT span, n_docs FROM spans
ORDER BY n_docs DESC, span ASC LIMIT 100
""",
)
def q135_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import tokens, word_shingles
    from tickerlake_spark.plans.q_llm import _mutated_docs

    corpus = _mutated_docs(spark, sf_dir, exact=True)
    sh = corpus.select(
        "doc_id", word_shingles(tokens("text"), n=8).alias("s")
    ).filter(F.size("s") > 0)
    return (
        sh.select("doc_id", F.explode("s").alias("span"))
        .groupBy("span")
        .agg(F.count("*").alias("n_docs"))  # shingles are distinct per doc
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("span").asc())
        .limit(100)
        .select("span", "n_docs")
    )


@register(
    "q137_quality_constraints",
    doc="Deequ-style data-quality constraint suite over lineitem/orders: "
    "completeness, primary-key uniqueness, referential integrity, and "
    "value-range compliance, each as a (constraint, metric, passed) row. "
    "Plan: ONE pass over lineitem computes every conditional count "
    "map-side (no per-constraint rescans); the FK check is a broadcast-"
    "able key-only semi-join; metrics are count ratios (bit-identical "
    "across engines, no float rounding needed).",
    oracle="""
WITH li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(l_shipdate) AS BIGINT) AS ship_nn,
         CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS pk_n,
         CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.10 THEN 1 ELSE 0 END) AS BIGINT) AS disc_ok,
         CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_ok
  FROM lineitem
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS fk_ok
  FROM lineitem l WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT c.constraint, c.metric, c.metric >= c.threshold AS passed
FROM (
  SELECT 'completeness_l_shipdate' AS constraint,
         CAST(ship_nn AS DOUBLE) / n AS metric, 1.0 AS threshold FROM li
  UNION ALL
  SELECT 'unique_pk_orderkey_linenumber',
         CAST(pk_n AS DOUBLE) / n, 1.0 FROM li
  UNION ALL
  SELECT 'fk_lineitem_orders',
         CAST(fk.fk_ok AS DOUBLE) / li.n, 1.0 FROM li, fk
  UNION ALL
  SELECT 'range_l_discount_0_to_0.10',
         CAST(disc_ok AS DOUBLE) / n, 1.0 FROM li
  UNION ALL
  SELECT 'range_l_quantity_1_to_50',
         CAST(qty_ok AS DOUBLE) / n, 1.0 FROM li
) c
ORDER BY c.constraint
""",
)
def q137_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    base = li.agg(
        F.count("*").alias("n"),
        F.count("l_shipdate").alias("ship_nn"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("pk_n"),
        F.sum(F.when(F.col("l_discount").between(0.0, 0.10), 1).otherwise(0)).alias(
            "disc_ok"
        ),
        F.sum(F.when(F.col("l_quantity").between(1, 50), 1).otherwise(0)).alias(
            "qty_ok"
        ),
    )
    fk_ok = (
        li.join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"),
                "left_semi")
        .agg(F.count("*").alias("fk_ok"))
    )
    both = base.crossJoin(F.broadcast(fk_ok))

    # ONE row of counters unpivoted via explode — a unionByName of five
    # per-constraint projections would re-plan the aggregation per branch
    # (10 fact scans; gated by test_quality_constraints_single_fact_
    # aggregation)
    constraints = [
        ("completeness_l_shipdate", "ship_nn"),
        ("unique_pk_orderkey_linenumber", "pk_n"),
        ("fk_lineitem_orders", "fk_ok"),
        ("range_l_discount_0_to_0.10", "disc_ok"),
        ("range_l_quantity_1_to_50", "qty_ok"),
    ]
    threshold = 1.0
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                (F.col(num).cast("double") / F.col("n")).alias("metric"),
            )
            for name, num in constraints
        ]
    )
    return (
        both.select(F.explode(rows).alias("r"))
        .select(
            F.col("r.constraint").alias("constraint"),
            F.col("r.metric").alias("metric"),
            (F.col("r.metric") >= threshold).alias("passed"),
        )
        .orderBy("constraint")
    )


@register(
    "q134_fuzzy_entity_join",
    doc="Entity resolution via blocked fuzzy join (operators/fuzzyjoin.py, "
    "symmetric-mask strategy): every customer key gets a deterministic "
    "one-digit corruption (position/rotation hash-derived, mirrored in the "
    "oracle), then each dirty record is matched back to its best clean "
    "customer within distance 2. Candidates come from an equi-join on "
    "k-masked string variants — C(9,2)=36 postings per record, linear, "
    "never the O(n^2) distance matrix; only candidate pairs pay the "
    "verify. Mask blocking (vs PassJoin segments) survives the zero-"
    "padded-key population at scale: the 10x bench OOM'd the segment "
    "strategy when all 150k keys shared the constant '000' segment, "
    "while masked variants keep buckets at n / 10^(entropy digits "
    "remaining).",
    oracle=f"""
WITH clean AS (
  SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS k FROM customer
),
dirty AS (
  SELECT c_custkey + 1000000 AS dirty_id,
         substr(k, 1, CAST(p AS INT))
           || CAST((CAST(substr(k, CAST(p AS INT) + 1, 1) AS INT) + r) % 10 AS VARCHAR)
           || substr(k, CAST(p AS INT) + 2) AS k
  FROM (SELECT c_custkey, k,
               {_H60_SQL.format(x="k")} % 9 AS p,
               1 + c_custkey % 9 AS r
        FROM clean)
),
lpost AS (
  SELECT dirty_id AS id, length(k) AS len, i AS seg_i,
         substr(k, CAST(floor(length(k) * i / 3) + 1 AS INT),
                CAST(floor(length(k) * (i + 1) / 3)
                     - floor(length(k) * i / 3) AS INT)) AS seg
  FROM dirty, unnest(range(0, 3)) AS t(i)
),
rpost AS (
  SELECT c_custkey AS id, length(k) AS len, i AS seg_i,
         substr(k, CAST(floor(length(k) * i / 3) + 1 AS INT),
                CAST(floor(length(k) * (i + 1) / 3)
                     - floor(length(k) * i / 3) AS INT)) AS seg
  FROM clean, unnest(range(0, 3)) AS t(i)
),
cand AS (
  SELECT DISTINCT a.id AS dirty_id, b.id AS c_custkey
  FROM lpost a JOIN rpost b
    ON a.seg_i = b.seg_i AND a.len = b.len AND a.seg = b.seg
),
verified AS (
  SELECT c.dirty_id, c.c_custkey,
         CAST(levenshtein(d.k, r.k) AS BIGINT) AS distance
  FROM cand c
  JOIN dirty d ON d.dirty_id = c.dirty_id
  JOIN clean r ON r.c_custkey = c.c_custkey
  WHERE levenshtein(d.k, r.k) <= 2
)
SELECT dirty_id, c_custkey AS matched_custkey, distance
FROM (SELECT *, row_number() OVER (PARTITION BY dirty_id
        ORDER BY distance ASC, c_custkey ASC) AS rn FROM verified)
WHERE rn = 1
ORDER BY dirty_id
""",
)
def q134_fuzzy_entity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import h60
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_best_match

    clean = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("k")
    )
    p = F.pmod(h60(F.col("k")), F.lit(9))
    r = 1 + F.col("c_custkey") % 9
    old_digit = F.substring(F.col("k"), (p + 1).cast("int"), F.lit(1)).cast("int")
    dirty = clean.select(
        (F.col("c_custkey") + 1000000).alias("dirty_id"),
        F.concat(
            F.substring(F.col("k"), F.lit(1), p.cast("int")),
            ((old_digit + r) % 10).cast("string"),
            F.substring(
                F.col("k"), (p + 2).cast("int"), F.length("k").cast("int")
            ),
        ).alias("k"),
    )
    best = fuzzy_best_match(
        dirty, clean, col="k", left_id="dirty_id", right_id="c_custkey", k=2
    )
    return best.select(
        "dirty_id", F.col("c_custkey").alias("matched_custkey"), "distance"
    ).orderBy("dirty_id")


@register(
    "q145_fuzzy_join_edits",
    doc="Entity resolution across LENGTH-CHANGING typos (the case q134's "
    "substitution blocking cannot see): every customer key gets either a "
    "hash-chosen digit DELETED (length 9 -> 8) or a digit INSERTED "
    "(length 9 -> 10), mirrored in the oracle, then matched back with "
    "fuzzy_best_match(strategy='deletes') — SymSpell delete-neighborhood "
    "blocking with exact recall for general levenshtein <= 2 "
    "(operators/fuzzyjoin.py). The plan stays an equi-join on delete-"
    "variant postings + map-side-combined argmin; the oracle brute-forces "
    "the same best match (exact recall makes the candidate sets equal).",
    oracle=f"""
WITH clean AS (
  SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS k FROM customer
),
base AS (
  SELECT c_custkey, k,
         {_H60_SQL.format(x="k")} % 9 AS p,
         1 + c_custkey % 9 AS r,
         {_H60_SQL.format(x="k")} % 2 AS op
  FROM clean
),
dirty AS (
  SELECT c_custkey + 2000000 AS dirty_id,
         CASE WHEN op = 0
              THEN substr(k, 1, CAST(p AS INT)) || substr(k, CAST(p + 2 AS INT), 9)
              ELSE substr(k, 1, CAST(p AS INT))
                   || CAST((CAST(substr(k, CAST(p + 1 AS INT), 1) AS INT) + r) % 10
                           AS VARCHAR)
                   || substr(k, CAST(p + 1 AS INT), 10)
         END AS k
  FROM base
),
cand AS (
  SELECT d.dirty_id, c.c_custkey,
         CAST(levenshtein(d.k, c.k) AS BIGINT) AS distance
  FROM dirty d JOIN clean c ON levenshtein(d.k, c.k) <= 2
)
SELECT dirty_id, c_custkey AS matched_custkey, distance
FROM (SELECT *, row_number() OVER (PARTITION BY dirty_id
        ORDER BY distance ASC, c_custkey ASC) AS rn FROM cand)
WHERE rn = 1
ORDER BY dirty_id
""",
)
def q145_fuzzy_join_edits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_best_match

    clean = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("k")
    )
    p = F.pmod(h60(F.col("k")), F.lit(9))
    r = 1 + F.col("c_custkey") % 9
    op = F.pmod(h60(F.col("k")), F.lit(2))
    old_digit = F.substring(F.col("k"), (p + 1).cast("int"), F.lit(1)).cast("int")
    deleted = F.concat(
        F.substring(F.col("k"), F.lit(1), p.cast("int")),
        F.substring(F.col("k"), (p + 2).cast("int"), F.lit(9)),
    )
    inserted = F.concat(
        F.substring(F.col("k"), F.lit(1), p.cast("int")),
        ((old_digit + r) % 10).cast("string"),
        F.substring(F.col("k"), (p + 1).cast("int"), F.lit(10)),
    )
    dirty = clean.select(
        (F.col("c_custkey") + 2000000).alias("dirty_id"),
        F.when(op == 0, deleted).otherwise(inserted).alias("k"),
    )
    best = fuzzy_best_match(
        dirty, clean, col="k", left_id="dirty_id", right_id="c_custkey",
        k=2, strategy="deletes",
    )
    return best.select(
        "dirty_id", F.col("c_custkey").alias("matched_custkey"), "distance"
    ).orderBy("dirty_id")


def purchase_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer-supplier purchase graph edge list (q136's input;
    also used directly by the plan-quality gate, which needs the lazy
    ``materialize=False`` pagerank plan)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # distinct on the integer key pair BEFORE the string tagging: the
    # dedup shuffle carries two longs per row instead of two strings
    pairs = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("b"),
        )
    )
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled PageRank CTE chain (same pattern as the k-means oracles in
    q_cluster: fixed iterations + per-iteration rounding = value-hashable)."""
    parts = ["""pairs AS (
  SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS a,
                  's:' || CAST(l.l_suppkey AS VARCHAR) AS b
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)""",
        "e AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, 1.0 / COUNT(*) AS inv_n FROM deg)",
        "r0 AS (SELECT src AS node, ROUND(nn.inv_n + 5e-13, 10) AS rank FROM deg, nn)",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""r{t} AS (
  SELECT node, ROUND((1.0 - 0.85) * nn.inv_n + 0.85 * s + 5e-13, 10) AS rank
  FROM (SELECT e.dst AS node, SUM(r.rank / deg.deg) AS s
        FROM e JOIN r{t - 1} r ON r.node = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst), nn
)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT node, ROUND(rank * nn.n + 5e-9, 6) AS score
FROM r{iters}, nn
ORDER BY score DESC, node ASC LIMIT 100"""
    )


@register(
    "q136_pagerank",
    doc="PageRank (5 fixed iterations, damping 0.85) over the symmetrized "
    "customer-supplier purchase graph, top-100 by normalized score. Each "
    "iteration is one rank-vector/edge-list join + one dst hash agg — the "
    "message-passing shape that scales to billions of edges (the rank "
    "vector shuffles, adjacency stays put). Deterministic across engines "
    "via per-iteration 10dp rounding (the q115 k-means contract), so the "
    "whole 5-iteration chain gets a value-hash oracle.",
    oracle=_pagerank_oracle(5),
)
def q136_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.graph import pagerank

    ranks = pagerank(
        purchase_graph_edges(spark, sf_dir), iters=5, damping=0.85, normalize=True
    )
    return (
        ranks.select("node", stable_round(F.col("score"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("node").asc())
        .limit(100)
    )


@register(
    "q140_k_anonymity",
    doc="k-anonymity / l-diversity release audit (the class-level companion "
    "of q70's span-level PII masking): per quasi-identifier equivalence "
    "class (nation x market segment), its size, the distinct count of the "
    "sensitive attribute (account-balance band), and the at-risk flag for "
    "classes below k=10. One hash aggregation on the quasi-ids — the exact-"
    "dedup plan shape, linear at any scale (operators/privacy.py).",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS BIGINT)
         AS l_diversity,
       COUNT(*) < 10 AS at_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
""",
)
def q140_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.privacy import k_anonymity_profile

    c = load_table(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    )
    prof = k_anonymity_profile(
        c, quasi_ids=["c_nationkey", "c_mktsegment"], sensitive="bal_band"
    )
    return prof.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "l_diversity",
        (F.col("class_size") < 10).alias("at_risk"),
    ).orderBy("c_nationkey", "c_mktsegment")


@register(
    "q141_snapshot_diff",
    doc="Keyed snapshot reconciliation (storage/diff.py::snapshot_diff): "
    "classify every order key as added / removed / changed between the "
    "stored snapshot and a deterministically-mutated next version "
    "(~1/97 removed, ~1/89 repriced, ~1/83 new keys — hash-derived, "
    "mirrored in the oracle). ONE full-outer join on the key with "
    "null-safe column comparison; per-class counts + the first 50 changed "
    "keys as the audit sample.",
    oracle=f"""
WITH old AS (SELECT o_orderkey, o_totalprice FROM orders),
new AS (
  SELECT o_orderkey,
         CASE WHEN {_H60_SQL.format(x="CAST(o_orderkey AS VARCHAR)")} % 89 = 1
              THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE {_H60_SQL.format(x="CAST(o_orderkey AS VARCHAR)")} % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice
  FROM orders WHERE {_H60_SQL.format(x="CAST(o_orderkey AS VARCHAR)")} % 83 = 2
),
diff AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
)
SELECT change, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key
FROM diff WHERE change <> 'unchanged'
GROUP BY change ORDER BY change
""",
)
def q141_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.functions.text import h60
    from tickerlake_spark.storage.diff import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    hk = h60(F.col("o_orderkey").cast("string"))
    new = (
        o.filter(F.pmod(hk, F.lit(97)) != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.pmod(hk, F.lit(89)) == 1, F.round(F.col("o_totalprice") * 1.1, 2)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.pmod(hk, F.lit(83)) == 2).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    d = snapshot_diff(o, new, keys=["o_orderkey"], compare=["o_totalprice"])
    return (
        d.groupBy("change")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").cast("long").alias("first_key"),
        )
        .orderBy("change")
    )


@register(
    "q143_partition_fingerprints",
    doc="Anti-entropy partition checksums (storage/diff.py::"
    "partition_fingerprints): an order-independent fingerprint per "
    "order-month — sum of bounded row hashes (h60 of the canonical row "
    "string mod 2^40) plus the row count. Replicas compare this tiny "
    "table first and run q141's row-level snapshot_diff only on the "
    "months that diverge. One map-side-combined hash agg; the shuffle "
    "carries one row per partition. Cross-engine portable: the oracle "
    "computes the identical checksum in DuckDB.",
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({_H60_SQL.format(
           x="concat_ws('|', COALESCE(CAST(o_orderkey AS VARCHAR), chr(2)), "
             "COALESCE(CAST(o_custkey AS VARCHAR), chr(2)), "
             "COALESCE(o_orderstatus, chr(2)), "
             "COALESCE(CAST(o_totalprice AS VARCHAR), chr(2)))"
       )} % 1099511627776) AS BIGINT) AS fingerprint
FROM orders
GROUP BY 1 ORDER BY 1
""",
)
def q143_partition_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.storage.diff import partition_fingerprints

    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    return partition_fingerprints(
        o, ["month"], cols=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ).orderBy("month")


@register(
    "q144_equidepth_binning",
    doc="Equi-depth feature discretization (decile binning of "
    "l_extendedprice): cutpoints from exact interpolated percentiles "
    "(collected — bounded, 9 doubles; approx_percentile is the drop-in "
    "at 100 TB), then a map-side bin assignment and one hash agg. "
    "Cutpoints and values are 6dp-stable-rounded on BOTH engines before "
    "comparison so boundary membership is bit-deterministic. The "
    "standard feature-engineering precursor for tree models and "
    "calibration histograms.",
    oracle="""
WITH cuts AS (
  SELECT ROUND(unnest(quantile_cont(l_extendedprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) + 5e-9, 6) AS c
  FROM lineitem
),
binned AS (
  SELECT (SELECT COUNT(*) FROM cuts
          WHERE c < ROUND(l.l_extendedprice + 5e-9, 6)) AS bin,
         l.l_extendedprice AS p
  FROM lineitem l
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(p) + 5e-9, 6) AS avg_price
FROM binned GROUP BY bin ORDER BY bin
""",
)
def q144_equidepth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    cuts_row = li.agg(
        F.expr(
            "percentile(l_extendedprice, array("
            + ",".join(str(x / 10.0) for x in range(1, 10))
            + "))"
        ).alias("c")
    ).first()["c"]
    cuts = [round(float(c) + 5e-9, 6) for c in cuts_row]
    v = stable_round(F.col("l_extendedprice"), 6)
    bin_expr = sum((v > F.lit(c)).cast("int") for c in cuts)
    return (
        li.select(bin_expr.cast("long").alias("bin"), F.col("l_extendedprice").alias("p"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), stable_round(F.avg("p"), 6).alias("avg_price"))
        .orderBy("bin")
    )


@register(
    "q147_cms_heavy_hitters",
    doc="Count-Min sketch heavy hitters (operators/cms.py; Cormode & "
    "Muthukrishnan 2005): a depth-4 x width-1024 counter sketch over all "
    "corpus tokens, point-queried for the exact top-20 tokens — output is "
    "(token, exact_n, cms_n, overcount), where cms_n >= exact_n always "
    "and overcount <= N/width w.h.p. Plan: the explode(depth) collapses "
    "via map-side combine to <= depth*width cells per task BEFORE the "
    "shuffle (bounded sketch cells move, never the token multiset), the "
    "probe join broadcasts the bounded sketch, and the top-20 is "
    "TakeOrderedAndProject. Cross-engine: cells are sums over row-salted "
    "h60 hashes — the oracle rebuilds the identical sketch in DuckDB.",
    oracle=f"""
WITH tw AS (
  SELECT w FROM (SELECT unnest({_TOK_SQL}) AS w FROM documents)
  WHERE w <> ''
),
cells AS (
  SELECT r, CAST({_H60_SQL.format(
      x="concat(CAST(r AS VARCHAR), ':', w)"
  )} % 1024 AS INT) AS c, CAST(COUNT(*) AS BIGINT) AS n
  FROM tw CROSS JOIN (SELECT unnest(range(4)) AS r)
  GROUP BY 1, 2
),
exact AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM tw GROUP BY w ORDER BY exact_n DESC, w ASC LIMIT 20
),
probes AS (
  SELECT e.w, e.exact_n, r, CAST({_H60_SQL.format(
      x="concat(CAST(r AS VARCHAR), ':', e.w)"
  )} % 1024 AS INT) AS c
  FROM exact e CROSS JOIN (SELECT unnest(range(4)) AS r)
),
est AS (
  SELECT w, exact_n, MIN(COALESCE(n, CAST(0 AS BIGINT))) AS cms_n
  FROM probes LEFT JOIN cells USING (r, c) GROUP BY 1, 2
)
SELECT w AS token, exact_n, cms_n, cms_n - exact_n AS overcount
FROM est ORDER BY exact_n DESC, token ASC
""",
)
def q147_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.cms import cms_delta, cms_point_estimates

    d = load_table(spark, sf_dir, "documents")
    tw = d.select(F.explode(tokens("text")).alias("w")).filter(F.col("w") != "")
    sketch = cms_delta(tw, [], "w", depth=4, width=1024)
    exact = (
        tw.groupBy("w")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("w").asc())
        .limit(20)
    )
    est = cms_point_estimates(sketch, exact, "w", depth=4, width=1024, out="cms_n")
    return est.select(
        F.col("w").alias("token"),
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
    ).orderBy(F.col("exact_n").desc(), F.col("token").asc())


@register(
    "q148_bloom_join_prune",
    doc="Bloom-filter semi-join reduction (operators/bloomjoin.py): the "
    "dim side (suppliers with s_nationkey <= 5) folds into an m-bit "
    "filter (bit_or of 32-bit words over k row-salted h60 probes); the "
    "fact scan tests membership as a pure map-side JVM expression BEFORE "
    "any exchange — the explicit, deterministic form of Spark's runtime "
    "bloom pushdown. Output audits the filter per l_returnflag: rows, "
    "bloom passes, true matches, false positives (m=128/k=2 chosen small "
    "enough that FPs actually occur; correctness never depends on them — "
    "the real join follows the bloom in production, see bloom_prune). "
    "Plan: dim collect is bounded (m/32 longs), match check is one "
    "broadcast semi-style join, one exchange total (the final groupBy).",
    oracle=f"""
WITH dim AS (
  SELECT DISTINCT s_suppkey AS key FROM supplier WHERE s_nationkey <= 5
),
pos AS (
  SELECT DISTINCT CAST({_H60_SQL.format(
      x="concat(CAST(j AS VARCHAR), ':', CAST(key AS VARCHAR))"
  )} % 128 AS BIGINT) AS p
  FROM dim CROSS JOIN (SELECT unnest(range(2)) AS j)
),
wsparse AS (
  SELECT CAST(p // 32 AS INT) AS wi,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
  FROM pos GROUP BY 1
),
words AS (
  SELECT list(COALESCE(word, CAST(0 AS BIGINT)) ORDER BY g.i) AS arr
  FROM (SELECT unnest(range(4)) AS i) g LEFT JOIN wsparse ON wi = g.i
),
probed AS (
  SELECT l_returnflag,
         CAST({_H60_SQL.format(
             x="concat('0:', CAST(l_suppkey AS VARCHAR))"
         )} % 128 AS BIGINT) AS p0,
         CAST({_H60_SQL.format(
             x="concat('1:', CAST(l_suppkey AS VARCHAR))"
         )} % 128 AS BIGINT) AS p1,
         l_suppkey IN (SELECT key FROM dim) AS m
  FROM lineitem
),
flags AS (
  SELECT l_returnflag, m,
         ((arr[CAST(p0 // 32 AS INT) + 1]
             & (CAST(1 AS BIGINT) << CAST(p0 % 32 AS INT))) <> 0
          AND (arr[CAST(p1 // 32 AS INT) + 1]
             & (CAST(1 AS BIGINT) << CAST(p1 % 32 AS INT))) <> 0) AS pass
  FROM probed CROSS JOIN words
)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
       CAST(SUM(CASE WHEN pass AND NOT m THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM flags GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def q148_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.bloomjoin import (
        bloom_literal,
        bloom_might_contain,
    )

    m_bits, k = 128, 2
    sup = load_table(spark, sf_dir, "supplier")
    # s_suppkey is the supplier PK — no distinct needed, which keeps the
    # dim side exchange-free (the gate pins total exchanges <= 2)
    dim = sup.filter(F.col("s_nationkey") <= 5).select("s_suppkey")
    words = bloom_literal(dim, "s_suppkey", m_bits, k)
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_suppkey")
    flagged = li.withColumn(
        "pass", bloom_might_contain(F.col("l_suppkey"), words, m_bits, k)
    ).join(
        F.broadcast(dim.withColumn("__m", F.lit(True))),
        li["l_suppkey"] == dim["s_suppkey"],
        "left",
    ).withColumn("m", F.coalesce(F.col("__m"), F.lit(False)))
    return (
        flagged.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("pass").cast("long")).alias("n_bloom_pass"),
            F.sum(F.col("m").cast("long")).alias("n_matches"),
            F.sum((F.col("pass") & ~F.col("m")).cast("long")).alias("n_false_pos"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q149_kmv_audience_overlap",
    doc="Sketch-space set overlap (Beyer et al. 2007 §5; operators/"
    "incremental_agg.py::kmv_jaccard_pairs): estimated distinct-user "
    "union and intersection for every pair of event types, computed from "
    "the per-type KMV sketches ALONE — the audience-overlap question "
    "answered on O(pairs x k) sketch rows instead of a distinct-pair "
    "shuffle over raw history. Below k the estimates are exact; above, "
    "the k-smallest-of-union rank plus the single-division KMV estimator "
    "keep the whole chain portable integer arithmetic the DuckDB oracle "
    "reproduces bit-for-bit. Plan: one distinct + two bounded rank "
    "windows build the sketches (shuffle carries hashes, never users); "
    "the pair fanout joins group-count-sized dims.",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT event_type AS g,
         {_H60_SQL.format(x="CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
sk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM d) WHERE rn <= 512
),
groups AS (SELECT DISTINCT g FROM sk),
pairs AS (
  SELECT x.g AS ga, y.g AS gb FROM groups x JOIN groups y ON x.g < y.g
),
tagged AS (
  SELECT ga, gb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
    SELECT ga, gb, h, 1 AS in_a, 0 AS in_b
    FROM pairs JOIN sk ON sk.g = pairs.ga
    UNION ALL
    SELECT ga, gb, h, 0 AS in_a, 1 AS in_b
    FROM pairs JOIN sk ON sk.g = pairs.gb
  ) GROUP BY ga, gb, h
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
    FROM tagged) WHERE rn <= 512
),
agg AS (
  SELECT ga, gb, COUNT(*) AS kk, SUM(in_a * in_b) AS inter, MAX(h) AS kth
  FROM top GROUP BY ga, gb
)
SELECT ga AS type_a, gb AS type_b,
       CAST(inter AS BIGINT) AS shared_in_topk,
       CAST(ROUND(CASE WHEN kk < 512 THEN CAST(kk AS DOUBLE)
             ELSE 511.0 / kth * 1152921504606846976.0 END) AS BIGINT)
         AS est_union,
       CAST(ROUND(CAST(inter AS DOUBLE) / kk *
             (CASE WHEN kk < 512 THEN CAST(kk AS DOUBLE)
              ELSE 511.0 / kth * 1152921504606846976.0 END)) AS BIGINT)
         AS est_intersection
FROM agg ORDER BY type_a, type_b
""",
)
def q149_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.incremental_agg import (
        kmv_delta,
        kmv_jaccard_pairs,
    )

    ev = load_table(spark, sf_dir, "events")
    sk = kmv_delta(ev, ["event_type"], "user_id", k=512)
    return (
        kmv_jaccard_pairs(sk, "event_type", k=512)
        .select(
            F.col("ga").alias("type_a"),
            F.col("gb").alias("type_b"),
            "shared_in_topk",
            "est_union",
            "est_intersection",
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q150_revenue_trend_ols",
    doc="Per-nation OLS trend of daily revenue (slope dollars/day, "
    "intercept, R^2) via one-pass sufficient statistics — the classic "
    "'closed-form analytics in a single aggregation' shape: two hash "
    "aggs (daily revenue, then per-nation moment sums) and a map-side "
    "closed form; no window, no collect, no iteration. Cross-engine "
    "determinism by EXACT ARITHMETIC, not rounding tolerance: daily "
    "revenue rounds to whole dollars (a long, +5e-7 boundary nudge in both "
    "engines), x is the day offset from "
    "1995-01-01 (a long), so every moment sum (Sx, Sy, Sxx, Sxy, Syy) "
    "is an exact integer in both engines regardless of partitioning or "
    "sum order; the final slope/intercept/R^2 are a fixed chain of IEEE "
    "ops on identical inputs. Valid while n*max(y)^2 < 2^63 (~4e17 here "
    "at sf0.01) — at larger scale, change y's unit, not the algorithm.",
    oracle="""
WITH daily AS (
  SELECT c.c_nationkey AS nk,
         CAST(datediff('day', DATE '1995-01-01', o.o_orderdate) AS BIGINT) AS x,
         CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-7) AS BIGINT) AS y
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
mom AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM daily GROUP BY nk
),
fit AS (
  SELECT nk, n,
         CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
         CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
         CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS deny,
         sx, sy
  FROM mom
)
SELECT na.n_name AS nation, n AS n_days,
       ROUND(num / denx + 5e-9, 6) AS slope,
       ROUND((sy - num / denx * sx) / n + 5e-9, 6) AS intercept,
       ROUND(num * num / (denx * deny) + 5e-9, 6) AS r2
FROM fit JOIN nation na ON na.n_nationkey = fit.nk
ORDER BY nation
""",
)
def q150_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
            .cast("long")
            .alias("x"),
        )
        .agg(
            # +5e-7 nudge mirrored in the oracle: a per-(nation, day) sum
            # landing within fp-summation error of a .5-dollar boundary must
            # round the same way in both engines (stable_round convention)
            F.round(F.sum("rev") + F.lit(5e-7)).cast("long").alias("y")
        )
    )
    # y*y (and the cross moments at larger y) exceed int64 once daily
    # revenue grows past ~3e9 — the 10x corpus does. decimal(38,0) keeps the
    # sums EXACT integers (the determinism contract), mirrored as HUGEINT in
    # the oracle; both engines then cast the identical exact integer to
    # double in the closed form.
    y_dec = F.col("y").cast("decimal(38,0)")
    mom = daily.groupBy("nk").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * y_dec).cast("decimal(38,0)").alias("sxy"),
        F.sum(y_dec * y_dec).cast("decimal(38,0)").alias("syy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    fit = mom.select(
        "nk",
        "n",
        (F.col("n") * F.col("sxy") - dec("sx") * F.col("sy"))
        .cast("double")
        .alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("denx"),
        (dec("n") * F.col("syy") - dec("sy") * F.col("sy"))
        .cast("double")
        .alias("deny"),
        "sx",
        "sy",
    )
    return (
        fit.join(F.broadcast(na), na["n_nationkey"] == fit["nk"])
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_days"),
            stable_round(F.col("num") / F.col("denx"), 6).alias("slope"),
            stable_round(
                (F.col("sy") - F.col("num") / F.col("denx") * F.col("sx"))
                / F.col("n"),
                6,
            ).alias("intercept"),
            stable_round(
                F.col("num") * F.col("num") / (F.col("denx") * F.col("deny")), 6
            ).alias("r2"),
        )
        .orderBy("nation")
    )


@register(
    "q152_cms_exact_heavy",
    doc="CMS candidate+verify EXACT heavy hitters (operators/cms.py::"
    "cms_candidate_verify; VERDICT r5 item 7): tokens with exact frequency "
    ">= total/30, computed as sketch pass -> map-side candidate filter -> "
    "exact count of survivors. The collected sketch (4x1024 cells, bounded) "
    "becomes literal arrays in the plan, so candidate pruning is a pure JVM "
    "expression on the scan — no join anywhere — and the exact-count "
    "shuffle carries only plausibly-heavy tokens. CMS never underestimates "
    "(no false negatives); the exact threshold on the verified counts "
    "removes the false positives. At 100 TB this turns 'exact counts of "
    "the heavy tail' from a full-multiset shuffle into a sketch pass plus "
    "a shuffle of the few candidate keys. Plan-gated: zero joins, candidate "
    "filter below the aggregate.",
    oracle=f"""
WITH tw AS (
  SELECT w FROM (SELECT unnest({_TOK_SQL}) AS w FROM documents)
  WHERE w <> ''
),
cells AS (
  SELECT r, CAST({_H60_SQL.format(
      x="concat(CAST(r AS VARCHAR), ':', w)"
  )} % 1024 AS INT) AS c, CAST(COUNT(*) AS BIGINT) AS n
  FROM tw CROSS JOIN (SELECT unnest(range(4)) AS r)
  GROUP BY 1, 2
),
thr AS (
  SELECT GREATEST(CAST(1 AS BIGINT), CAST(SUM(n) // 30 AS BIGINT)) AS t
  FROM cells WHERE r = 0
),
probes AS (
  SELECT d.w, r, CAST({_H60_SQL.format(
      x="concat(CAST(r AS VARCHAR), ':', d.w)"
  )} % 1024 AS INT) AS c
  FROM (SELECT DISTINCT w FROM tw) d
  CROSS JOIN (SELECT unnest(range(4)) AS r)
),
est AS (
  SELECT w, MIN(COALESCE(n, CAST(0 AS BIGINT))) AS cms_n
  FROM probes LEFT JOIN cells USING (r, c) GROUP BY w
),
cand AS (SELECT w, cms_n FROM est, thr WHERE cms_n >= thr.t),
exact AS (
  SELECT tw.w, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM tw JOIN cand ON cand.w = tw.w GROUP BY tw.w
)
SELECT e.w AS token, e.exact_n, c.cms_n
FROM exact e JOIN cand c ON c.w = e.w, thr
WHERE e.exact_n >= thr.t
ORDER BY e.exact_n DESC, token ASC
""",
)
def q152_cms_exact_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickerlake_spark.operators.cms import cms_candidate_verify

    d = load_table(spark, sf_dir, "documents")
    tw = d.select(F.explode(tokens("text")).alias("w")).filter(F.col("w") != "")
    out = cms_candidate_verify(tw, "w", threshold_den=30, depth=4, width=1024)
    return out.select(
        F.col("w").alias("token"), "exact_n", "cms_n"
    ).orderBy(F.col("exact_n").desc(), F.col("token").asc())


@register(
    "q153_snapshot_merge",
    doc="Snapshot-table MERGE semantics end to end (storage/snapshots.py, "
    "r10): overwrite-commit a base slice of documents, append-commit a "
    "second slice, then keyed-upsert a correction batch (doc_id %% 6 == 0, "
    "n_chars bumped) — three manifest-committed versions, the upsert "
    "rewriting only files whose committed doc_id range overlaps the batch. "
    "Returns the CURRENT version via snap_read (the manifest's pinned file "
    "list, no directory listing). The oracle is the equivalent SQL MERGE "
    "(anti-join + union), so the snapshot layer's visible semantics are "
    "value-hash-checked against a plain-SQL engine, not just pytest-pinned. "
    "Builds in a throwaway temp dir per invocation.",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 IN (0, 1)
),
ups AS (
  SELECT doc_id, lang, n_chars + 1000 AS n_chars
  FROM documents WHERE doc_id % 6 = 0
)
SELECT b.doc_id, b.lang, b.n_chars FROM base b
WHERE b.doc_id NOT IN (SELECT doc_id FROM ups)
UNION ALL
SELECT doc_id, lang, n_chars FROM ups
""",
)
def q153_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import (
        snap_current_version,
        snap_read,
        snap_upsert,
        snap_write,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp_root = tempfile.mkdtemp(prefix="q153_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(
            spark, d.filter(F.col("doc_id") % 3 == 0), path, stats_cols=("doc_id",)
        )
        snap_write(
            spark,
            d.filter(F.col("doc_id") % 3 == 1),
            path,
            mode="append",
            stats_cols=("doc_id",),
        )
        ups = d.filter(F.col("doc_id") % 6 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        )
        snap_upsert(spark, path, ups, keys=["doc_id"], stats_cols=("doc_id",))
        assert snap_current_version(path) == 3
        # materialize before the temp dir is reclaimed (ADVICE r10: bench
        # harnesses invoke registered queries repeatedly — leaking three
        # commits' parquet per call accumulates disk across a run); the
        # visible table is small by construction (2/3 of documents)
        out = snap_read(spark, path)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q154_snapshot_split_manifest",
    doc="Split-manifest snapshot path end to end (storage/snapshots.py "
    "r11): with the inline limit shrunk so every commit spills its file "
    "entries into chunk objects (manifest-list indirection), overwrite- "
    "then append-commit documents slices, keyed-upsert a correction "
    "batch (carried chunk refs + rewritten overlaps), and return a "
    "chunk-PRUNED snap_read restricted to a doc_id range. Pruning is an "
    "optimization, never a filter — the oracle is the plain SQL over the "
    "same final table state, so values prove the chunk machinery changes "
    "nothing. Builds in a throwaway temp dir per invocation.",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 IN (0, 1)
),
ups AS (
  SELECT doc_id, lang, n_chars + 1000 AS n_chars
  FROM documents WHERE doc_id % 6 = 0
),
merged AS (
  SELECT b.doc_id, b.lang, b.n_chars FROM base b
  WHERE b.doc_id NOT IN (SELECT doc_id FROM ups)
  UNION ALL
  SELECT doc_id, lang, n_chars FROM ups
)
SELECT doc_id, lang, n_chars FROM merged
WHERE doc_id BETWEEN 100 AND 400
""",
)
def q154_snapshot_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile

    from tickerlake_spark.storage import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp_root = tempfile.mkdtemp(prefix="q154_snap_")
    path = tmp_root + "/t"
    old = (S._INLINE_LIMIT, S._CHUNK_TARGET)
    S._INLINE_LIMIT, S._CHUNK_TARGET = 2, 2  # force the split path
    try:
        S.snap_write(
            spark, d.filter(F.col("doc_id") % 3 == 0), path,
            cluster_by=("doc_id",), target_files=6,
        )
        S.snap_write(
            spark, d.filter(F.col("doc_id") % 3 == 1), path, mode="append",
            cluster_by=("doc_id",), target_files=6,
        )
        ups = d.filter(F.col("doc_id") % 6 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        )
        S.snap_upsert(spark, path, ups, keys=["doc_id"], stats_cols=("doc_id",))
        # the split path really ran: the current manifest holds chunk refs
        m = json.loads(
            open(os.path.join(path, "_snap", "v0000000003.json")).read()
        )
        assert m.get("chunks") or len(m.get("files", [])) <= 2
        out = S.snap_read(spark, path, prune=("doc_id", 100, 400)).filter(
            F.col("doc_id").between(100, 400)
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        S._INLINE_LIMIT, S._CHUNK_TARGET = old
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q155_snapshot_changes",
    doc="Version-bounded incremental consumption (storage/snapshots.py "
    "snap_changes, r11): commit a base documents slice, APPEND two more "
    "slices as versions 2 and 3, then keyed-upsert a correction as "
    "version 4 — and read the delta BETWEEN versions 1 and 3 (the two "
    "pure appends). The manifest diff pins exactly the appended files: "
    "the later upsert's rewrites are outside the bounded window, so the "
    "delta is deterministic and equals the two appended slices — which "
    "is the oracle. Builds in a throwaway temp dir per invocation.",
    oracle="""
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id % 4 IN (1, 2)
""",
)
def q155_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import (
        snap_changes,
        snap_current_version,
        snap_upsert,
        snap_write,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp_root = tempfile.mkdtemp(prefix="q155_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(spark, d.filter(F.col("doc_id") % 4 == 0), path,
                   stats_cols=("doc_id",))
        snap_write(spark, d.filter(F.col("doc_id") % 4 == 1), path,
                   mode="append", stats_cols=("doc_id",))
        snap_write(spark, d.filter(F.col("doc_id") % 4 == 2), path,
                   mode="append", stats_cols=("doc_id",))
        ups = d.filter(F.col("doc_id") % 8 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(7)
        )
        snap_upsert(spark, path, ups, keys=["doc_id"], stats_cols=("doc_id",))
        assert snap_current_version(path) == 4
        out = snap_changes(spark, path, since_version=1, version=3)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q157_snapshot_evolve",
    doc="ADD-only schema evolution on a snapshot table (storage/snapshots.py "
    "snap_write(evolve_schema=True), r11): overwrite-commit a 2-column "
    "documents slice, append a 3-column slice that EVOLVES the pinned "
    "schema (new column nullable; pre-evolution files read it as NULL via "
    "parquet schema projection, no rewrite), then keyed-upsert a correction "
    "that backfills the new column for half the pre-evolution rows — the "
    "merge runs through the evolved pinned schema over mixed-width files. "
    "The oracle is the plain-SQL equivalent with an explicit NULL column "
    "on the narrow slice, so evolution's visible semantics are value-hash-"
    "checked against another engine. Version 1 keeps its own narrower "
    "pinned schema (asserted): time travel is schema travel. Builds in a "
    "throwaway temp dir per invocation.",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 3 = 0
),
evo AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 1
),
ups AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 6 = 0
)
SELECT doc_id, lang, n_chars FROM base
WHERE doc_id NOT IN (SELECT doc_id FROM ups)
UNION ALL
SELECT doc_id, lang, n_chars FROM evo
UNION ALL
SELECT doc_id, lang, n_chars FROM ups
""",
)
def q157_snapshot_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import (
        snap_read,
        snap_schema,
        snap_upsert,
        snap_write,
    )

    d = load_table(spark, sf_dir, "documents")
    tmp_root = tempfile.mkdtemp(prefix="q157_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(
            spark,
            d.filter(F.col("doc_id") % 3 == 0).select("doc_id", "lang"),
            path,
            stats_cols=("doc_id",),
        )
        snap_write(
            spark,
            d.filter(F.col("doc_id") % 3 == 1).select(
                "doc_id", "lang", "n_chars"
            ),
            path,
            mode="append",
            evolve_schema=True,
            stats_cols=("doc_id",),
        )
        ups = d.filter(F.col("doc_id") % 6 == 0).select(
            "doc_id", "lang", "n_chars"
        )
        snap_upsert(spark, path, ups, keys=["doc_id"], stats_cols=("doc_id",))
        # evolution really happened: version 1's pinned schema is narrower
        assert [f.name for f in snap_schema(path, version=1).fields] == [
            "doc_id", "lang",
        ]
        out = snap_read(spark, path)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q158_snapshot_zorder",
    doc="Z-ordered snapshot layout (storage/snapshots.py snap_write("
    "zorder_by=...) over storage/clustering.zorder_key, r11): commit "
    "documents laid out along the interleaved-bit Morton key of (doc_id, "
    "n_chars), then read with a manifest prune on n_chars — the NON-"
    "leading dimension, where lexicographic clustering skips nothing — "
    "plus the residual row filter (pruning is an optimization, never a "
    "filter). The oracle is the plain SQL over the same table, so the "
    "Morton layout and multi-dimension file skipping are value-hash-"
    "checked to change nothing. Builds in a throwaway temp dir per "
    "invocation.",
    oracle="""
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars BETWEEN 200 AND 900
""",
)
def q158_snapshot_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import snap_read, snap_write

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    tmp_root = tempfile.mkdtemp(prefix="q158_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(
            spark, d, path, zorder_by=("doc_id", "n_chars"), target_files=16
        )
        out = snap_read(
            spark, path, prune=("n_chars", 200, 900)
        ).filter(F.col("n_chars").between(200, 900))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q159_snapshot_restore",
    doc="RESTORE as a metadata-only commit (storage/snapshots.py "
    "snap_restore, r11): overwrite-commit a documents slice, append a "
    "second slice, keyed-upsert a correction (three versions), then roll "
    "the table BACK to version 1 — a fourth commit that re-publishes v1's "
    "file list verbatim (no data file read, copied, or rewritten; the bad "
    "commits stay time-travelable until vacuum expires them). The visible "
    "table after restore must equal the ORIGINAL slice exactly, which is "
    "the oracle — value-hash-checked so the rollback machinery provably "
    "reproduces v1, not something close to it. Builds in a throwaway temp "
    "dir per invocation.",
    oracle="""
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 0
""",
)
def q159_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import (
        snap_current_version,
        snap_read,
        snap_restore,
        snap_upsert,
        snap_write,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp_root = tempfile.mkdtemp(prefix="q159_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(
            spark, d.filter(F.col("doc_id") % 3 == 0), path, stats_cols=("doc_id",)
        )
        snap_write(
            spark, d.filter(F.col("doc_id") % 3 == 1), path,
            mode="append", stats_cols=("doc_id",),
        )
        ups = d.filter(F.col("doc_id") % 6 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000)
        )
        snap_upsert(spark, path, ups, keys=["doc_id"], stats_cols=("doc_id",))
        r = snap_restore(path, 1)
        assert r["version"] == 4 and snap_current_version(path) == 4
        out = snap_read(spark, path)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q160_snapshot_row_changes",
    doc="EXACT row-level CDC between snapshot versions (storage/"
    "snapshots.py snap_row_changes, r11 — the public Delta CDF "
    "_change_type convention, computed post-hoc from manifests): commit a "
    "documents slice, then one keyed upsert that UPDATES the doc_id%6==0 "
    "rows and INSERTS the doc_id%6==2 rows; the feed between v1 and v2 "
    "must contain exactly one update_preimage/update_postimage pair per "
    "updated key and one insert per new key — rewritten-but-unchanged "
    "rows sharing the same files cancel via exceptAll, so cost is "
    "O(churn), never O(table). The oracle reconstructs the same feed in "
    "plain SQL. Builds in a throwaway temp dir per invocation.",
    oracle="""
SELECT doc_id, lang, n_chars, 'update_preimage' AS _change_type
FROM documents WHERE doc_id % 6 = 0
UNION ALL
SELECT doc_id, lang, n_chars + 1000 AS n_chars, 'update_postimage' AS _change_type
FROM documents WHERE doc_id % 6 = 0
UNION ALL
SELECT doc_id, lang, n_chars, 'insert' AS _change_type
FROM documents WHERE doc_id % 6 = 2
""",
)
def q160_snapshot_row_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import (
        snap_row_changes,
        snap_upsert,
        snap_write,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp_root = tempfile.mkdtemp(prefix="q160_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(
            spark,
            d.filter(F.col("doc_id") % 3 < 2),
            path,
            cluster_by=("doc_id",),
            target_files=6,
        )
        batch = (
            d.filter(F.col("doc_id") % 6 == 0)
            .withColumn("n_chars", F.col("n_chars") + F.lit(1000))
            .unionByName(d.filter(F.col("doc_id") % 6 == 2))
        )
        snap_upsert(spark, path, batch, keys=["doc_id"], stats_cols=("doc_id",))
        out = snap_row_changes(spark, path, 1, 2, keys=["doc_id"])
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)


@register(
    "q156_snapshot_replace_where",
    doc="Range-scoped REPLACE as one snapshot commit (storage/snapshots.py "
    "snap_replace_where, r11 — the open formats' public replaceWhere idea): "
    "overwrite-commit the even-doc_id documents slice date-clustered, then "
    "atomically replace the doc_id range [100, 400] with a RE-DERIVED slice "
    "in which rows not divisible by 3 DISAPPEAR (the delete-inside-a-range "
    "semantics a keyed upsert can never express — an open resample bucket "
    "whose event drops back below threshold). Files provably outside the "
    "range are carried into the new version by reference. The oracle is the "
    "plain-SQL equivalent (delete range + insert), so the replace semantics "
    "are value-hash-checked against another engine. Builds in a throwaway "
    "temp dir per invocation.",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
),
rep AS (
  SELECT doc_id, lang, n_chars + 500 AS n_chars FROM documents
  WHERE doc_id % 2 = 0 AND doc_id BETWEEN 100 AND 400 AND doc_id % 3 = 0
)
SELECT doc_id, lang, n_chars FROM base
WHERE doc_id NOT BETWEEN 100 AND 400
UNION ALL
SELECT doc_id, lang, n_chars FROM rep
""",
)
def q156_snapshot_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tickerlake_spark.storage.snapshots import (
        snap_read,
        snap_replace_where,
        snap_write,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp_root = tempfile.mkdtemp(prefix="q156_snap_")
    path = tmp_root + "/t"
    try:
        snap_write(
            spark, d.filter(F.col("doc_id") % 2 == 0), path,
            cluster_by=("doc_id",), target_files=6,
        )
        rep = (
            d.filter(
                (F.col("doc_id") % 2 == 0)
                & F.col("doc_id").between(100, 400)
                & (F.col("doc_id") % 3 == 0)
            ).withColumn("n_chars", F.col("n_chars") + F.lit(500))
        )
        r = snap_replace_where(spark, path, rep, "doc_id", 100, 400)
        # the clustered layout makes the rewrite range-local: files outside
        # [100, 400] were carried by reference, never read
        assert r["rewrote_files"] < r["files"], r
        out = snap_read(spark, path)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)
