"""Property tests for the frequency/membership sketches (operators/cms.py,
operators/bloomjoin.py): the guarantees the 100 TB designs rest on, pinned
against pure-Python brute force over random inputs.

- CMS: estimates never underestimate; merging arbitrary splits is
  cell-identical to one-shot sketching (the incremental-rollup algebra).
- Bloom: zero false negatives for ANY inserted key set (the property that
  makes pre-shuffle pruning safe); the word table equals a pure-Python
  reference bit-for-bit, so the oracle SQL mirrors are trustworthy.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def items_lists():
    return st.lists(
        st.text(alphabet="abcxyz01", min_size=1, max_size=6),
        min_size=5,
        max_size=60,
    )


@settings(**SETTINGS)
@given(items=items_lists(), width=st.sampled_from([16, 64]))
def test_cms_point_estimates_dominate_exact_counts(spark, items, width):
    from tickerlake_spark.operators.cms import cms_delta, cms_point_estimates

    df = spark.createDataFrame([(x,) for x in items], "item string")
    sketch = cms_delta(df, [], "item", depth=3, width=width)
    exact = Counter(items)
    cand = spark.createDataFrame([(x,) for x in set(items)], "item string")
    est = {
        r.item: r.cms_count
        for r in cms_point_estimates(
            sketch, cand, "item", depth=3, width=width
        ).collect()
    }
    assert set(est) == set(exact)
    for item, n in exact.items():
        assert est[item] >= n, (item, est[item], n)
        # union-bound sanity: a single cell can never exceed total mass
        assert est[item] <= len(items)


@settings(**SETTINGS)
@given(items=items_lists(), cut=st.integers(1, 4))
def test_cms_merge_of_any_split_equals_one_shot(spark, items, cut):
    from tickerlake_spark.operators.cms import cms_delta, cms_merge

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(items)], "i long, item string"
    )
    a = cms_delta(df.filter(F.col("i") % 5 < cut), [], "item", width=32)
    b = cms_delta(df.filter(F.col("i") % 5 >= cut), [], "item", width=32)
    merged = {(r.r, r.c): r.n for r in cms_merge(a, b, []).collect()}
    oneshot = {
        (r.r, r.c): r.n for r in cms_delta(df, [], "item", width=32).collect()
    }
    assert merged == oneshot


@settings(**SETTINGS)
@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True))
def test_bloom_words_match_python_reference_and_admit_all(spark, keys):
    from tickerlake_spark.operators.bloomjoin import (
        bloom_literal,
        bloom_might_contain,
    )

    m, k = 256, 3
    dim = spark.createDataFrame([(x,) for x in keys], "key long")
    words = bloom_literal(dim, "key", m_bits=m, k=k)

    want = [0] * (m // 32)
    for key in keys:
        for j in range(k):
            p = _h60(f"{j}:{key}") % m
            want[p // 32] |= 1 << (p % 32)
    assert words == want

    misses = dim.filter(
        ~bloom_might_contain(F.col("key"), words, m_bits=m, k=k)
    ).count()
    assert misses == 0


def test_cms_candidate_verify_equals_exact_threshold(spark):
    """candidate+verify is EXACT: for any multiset and threshold, its output
    equals the brute-force 'count all, filter >= T' answer — CMS overcount
    can only admit extra candidates (verified away), never drop a true
    heavy hitter."""
    import random

    from pyspark.sql import functions as F

    from tickerlake_spark.operators.cms import cms_candidate_verify

    rng = random.Random(7)
    # skewed multiset over a domain wider than the sketch would like
    items = [f"k{rng.randint(0, 400) ** 2 % 997}" for _ in range(6000)]
    df = spark.createDataFrame([(w,) for w in items], "w string")
    for t in (5, 25, 80):
        got = {
            (r.w, r.exact_n)
            for r in cms_candidate_verify(df, "w", threshold=t, depth=4, width=64).collect()
        }
        want = {
            (r.w, r.cnt)
            for r in df.groupBy("w")
            .agg(F.count("*").cast("long").alias("cnt"))
            .filter(F.col("cnt") >= t)
            .collect()
        }
        assert got == want, f"threshold {t}: {got ^ want}"
        # and every returned cms_n dominates its exact_n (sketch invariant)
        rows = cms_candidate_verify(df, "w", threshold=t, depth=4, width=64).collect()
        assert all(r.cms_n >= r.exact_n for r in rows)
