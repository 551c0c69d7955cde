"""Property-based tests for the curation operators against pure-Python
oracles: random tiny corpora, real Spark jobs per example (so examples are
few and small, same convention as test_property_storage).

- strip_repeated_spans == a 15-line Python chunk-frequency reference, for
  ANY corpus (duplicated spans, short docs, single-word docs);
- assign_shards == the naive Python running-sum packing, for ANY doc set
  and budget — i.e. the two-level distributed prefix-sum is EXACTLY the
  single-sequence cumsum it replaces;
- mixture_select keeps exactly the docs whose deterministic selector falls
  under their source's rate, and the rate math matches Python.
"""

from __future__ import annotations


import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

WORDS = ["alpha", "beta", "gamma", "delta", "ep", "zeta"]


@st.composite
def corpora(draw):
    """2-10 docs of 1-20 words over a 6-word vocabulary — small vocab makes
    repeated spans actually occur."""
    n = draw(st.integers(2, 10))
    docs = []
    for i in range(n):
        k = draw(st.integers(1, 20))
        words = [WORDS[draw(st.integers(0, len(WORDS) - 1))] for _ in range(k)]
        docs.append((i * 3 + 1, " ".join(words)))  # non-contiguous ids
    return docs


def _py_strip(docs, span_words, min_freq):
    chunks_of = {}
    freq = Counter()
    for doc_id, text in docs:
        ws = text.split(" ")
        chunks = [
            " ".join(ws[i : i + span_words])
            for i in range(0, len(ws), span_words)
        ]
        chunks_of[doc_id] = chunks
        freq.update(chunks)
    out = {}
    for doc_id, chunks in chunks_of.items():
        kept = [c for c in chunks if freq[c] < min_freq]
        out[doc_id] = (
            len(chunks),
            len(chunks) - len(kept),
            " ".join(kept),
        )
    return out


@given(corpora(), st.integers(2, 4), st.integers(2, 3))
@settings(**SETTINGS)
def test_strip_repeated_spans_matches_python(spark, docs, span_words, min_freq):
    from tickerlake_spark.operators.curation import strip_repeated_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_removed"], r["kept_text"])
        for r in strip_repeated_spans(
            df, span_words=span_words, min_freq=min_freq
        ).collect()
    }
    assert got == _py_strip(docs, span_words, min_freq)


@given(corpora(), st.integers(2, 40))
@settings(**SETTINGS)
def test_assign_shards_matches_python_cumsum(spark, docs, budget):
    from tickerlake_spark.operators.curation import assign_shards

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["tokens_through"], r["shard_id"])
        for r in assign_shards(df, shard_budget=budget).collect()
    }
    # python reference: order by (h, doc_id), running sum, floor-div budget
    rows = [
        (doc_id, ((doc_id % 2**31) * 2654435761) % 2**32, len(text.split(" ")))
        for doc_id, text in docs
    ]
    rows.sort(key=lambda r: (r[1], r[0]))
    cum = 0
    exp = {}
    for doc_id, _h, n in rows:
        cum += n
        exp[doc_id] = (n, cum, (cum - n) // budget)
    assert got == exp


@given(corpora(), st.integers(1, 9))
@settings(**SETTINGS)
def test_mixture_select_matches_python(spark, docs, budget_tenths):
    from tickerlake_spark.operators.curation import (
        mixture_rates,
        mixture_select,
    )

    budget_frac = budget_tenths / 10.0
    with_src = [
        (doc_id, text, f"s{doc_id % 3}") for doc_id, text in docs
    ]
    df = spark.createDataFrame(with_src, "doc_id long, text string, source string")

    rates = mixture_rates(df, alpha=0.5, budget_frac=budget_frac)
    got = {r["doc_id"] for r in mixture_select(df, rates).collect()}

    tokens = defaultdict(int)
    for doc_id, text, src in with_src:
        tokens[src] += len(text.split(" "))
    total = sum(tokens.values())
    denom = sum(math.sqrt(v) for v in tokens.values())
    rate = {
        s: min(1.0, budget_frac * total * math.sqrt(v) / denom / v)
        for s, v in tokens.items()
    }
    exp = {
        doc_id
        for doc_id, text, src in with_src
        if (((doc_id % 2**31) * 2654435761) % 2**32) / 2**32 < rate[src]
    }
    assert got == exp
