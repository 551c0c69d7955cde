"""Fuzzy string join (operators/fuzzyjoin.py): recall/precision contract.

The operator guarantees: every pair within SUBSTITUTION distance <= k is
found (pigeonhole over k+1 segments), and nothing beyond levenshtein
distance <= k is returned. Random-corpus property test pins both bounds
against pure-Python brute force; a deterministic test pins the distance
values themselves.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _hamming(a: str, b: str) -> int:
    if len(a) != len(b):
        return 10**9
    return sum(x != y for x, y in zip(a, b))


@st.composite
def corpora(draw):
    n = draw(st.integers(15, 40))
    base = [
        "".join(
            draw(st.sampled_from("ab01")) for _ in range(draw(st.sampled_from([8, 9])))
        )
        for _ in range(n)
    ]
    return sorted(set(base))


@settings(**SETTINGS)
@given(words=corpora(), strategy=st.sampled_from(["segments", "masks"]))
def test_fuzzy_join_bounds_vs_bruteforce(spark, words, strategy):
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_substitution_join

    left = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "lid long, s string")
    right = spark.createDataFrame(
        [(i + 10_000, w) for i, w in enumerate(words)], "rid long, s string"
    )
    got = {
        (r.lid, r.rid): r.distance
        for r in fuzzy_substitution_join(
            left, right, col="s", left_id="lid", right_id="rid", k=2,
            strategy=strategy,
        ).collect()
    }
    must_find = set()
    may_find = set()
    for i, a in enumerate(words):
        for j, b in enumerate(words):
            if _hamming(a, b) <= 2:
                must_find.add((i, j + 10_000))
            if _lev(a, b) <= 2:
                may_find.add((i, j + 10_000))
    missing = must_find - set(got)
    extra = set(got) - may_find
    assert not missing, f"substitution-recall violated: {sorted(missing)[:5]}"
    assert not extra, f"precision violated: {sorted(extra)[:5]}"
    if strategy == "masks":
        # masks candidates are EXACTLY the Hamming<=k pairs
        assert set(got) == must_find
    for (lid, rid), d in got.items():
        assert d == _lev(words[lid], words[rid - 10_000])


def test_fuzzy_join_distances_deterministic(spark):
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_substitution_join

    words = ["000111222", "000111223", "000119223", "999999999", "000111"]
    left = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "lid long, s string")
    got = {
        (r.lid, r.rid): r.distance
        for r in fuzzy_substitution_join(
            left, left.selectExpr("lid as rid", "s"), "s", "lid", "rid", k=2
        )
        .filter("lid < rid")
        .collect()
    }
    assert got == {(0, 1): 1, (0, 2): 2, (1, 2): 1}  # lengths differ -> no pair with idx 4


def test_mask_strategy_k1(spark):
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_substitution_join

    words = ["abcd", "abce", "abff", "abcd"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "lid long, s string"
    )
    got = {
        (r.lid, r.rid): r.distance
        for r in fuzzy_substitution_join(
            df, df.selectExpr("lid as rid", "s"), "s", "lid", "rid",
            k=1, strategy="masks",
        )
        .filter("lid < rid")
        .collect()
    }
    # (0,1) hamming 1; (0,3) exact dup; (1,3) hamming 1; (2,*) hamming 2 -> out
    assert got == {(0, 1): 1, (0, 3): 0, (1, 3): 1}


def test_mask_strategy_short_strings(spark):
    """Strings shorter than k must still pair up (ADVICE r4: the k-subset
    HOF emits no variants for length < k and explode dropped the row —
    even exact duplicates went unmatched)."""
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_substitution_join

    words = ["a", "b", "a", "", "", "xy", "xz"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "lid long, s string"
    )
    got = {
        (r.lid, r.rid): r.distance
        for r in fuzzy_substitution_join(
            df, df.selectExpr("lid as rid", "s"), "s", "lid", "rid",
            k=2, strategy="masks",
        )
        .filter("lid < rid")
        .collect()
    }
    # every equal-length pair with hamming <= 2 must appear, incl. the
    # exact dups (0,2) and (3,4) that the unguarded HOF dropped
    assert got == {(0, 1): 1, (0, 2): 0, (1, 2): 1, (3, 4): 0, (5, 6): 1}


@st.composite
def mixed_length_corpora(draw):
    """Lengths 0-9: exercises insertions/deletions, not just substitutions."""
    n = draw(st.integers(15, 40))
    base = [
        "".join(
            draw(st.sampled_from("ab01")) for _ in range(draw(st.integers(0, 9)))
        )
        for _ in range(n)
    ]
    return sorted(set(base))


@settings(**SETTINGS)
@given(words=mixed_length_corpora(), k=st.sampled_from([1, 2]))
def test_deletes_strategy_full_edit_distance(spark, words, k):
    """strategy='deletes' finds EXACTLY the levenshtein<=k pairs — including
    length-changing insert/delete edits the other strategies can't see."""
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_substitution_join

    left = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "lid long, s string")
    right = spark.createDataFrame(
        [(i + 10_000, w) for i, w in enumerate(words)], "rid long, s string"
    )
    got = {
        (r.lid, r.rid): r.distance
        for r in fuzzy_substitution_join(
            left, right, col="s", left_id="lid", right_id="rid", k=k,
            strategy="deletes",
        ).collect()
    }
    want = {
        (i, j + 10_000): _lev(a, b)
        for i, a in enumerate(words)
        for j, b in enumerate(words)
        if _lev(a, b) <= k
    }
    assert got == want


def test_deletes_best_match_insertions(spark):
    """Best-match resolution across length-changing typos (the entity-
    resolution case substitution-only blocking silently misses)."""
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_best_match

    canon = [(1, "john smith"), (2, "jane smith"), (3, "bob jones")]
    dirty = [
        (10, "john smth"),   # deletion -> 1
        (11, "jane smithh"), # insertion -> 2
        (12, "bob joness"),  # insertion -> 3
        (13, "completely different"),  # no match within k=2
    ]
    left = spark.createDataFrame(dirty, "lid long, s string")
    right = spark.createDataFrame(canon, "rid long, s string")
    for staged in (False, True):
        got = {
            r.lid: (r.rid, r.distance)
            for r in fuzzy_best_match(
                left, right, "s", "lid", "rid", k=2,
                strategy="deletes", staged=staged,
            ).collect()
        }
        assert got == {10: (1, 1), 11: (2, 1), 12: (3, 1)}, got


@settings(**SETTINGS)
@given(words=corpora(), staged=st.booleans())
def test_fuzzy_best_match_vs_bruteforce(spark, words, staged):
    """fuzzy_best_match (staged and single-pass) == brute-force argmin over
    the Hamming<=k candidate set, tie-broken by min right id; left records
    with no candidate are absent."""
    from tickerlake_spark.operators.fuzzyjoin import fuzzy_best_match

    left = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "lid long, s string"
    )
    right = spark.createDataFrame(
        [(i + 10_000, w) for i, w in enumerate(words)], "rid long, s string"
    )
    got = {
        r.lid: (r.rid, r.distance)
        for r in fuzzy_best_match(
            left, right, col="s", left_id="lid", right_id="rid",
            k=2, staged=staged,
        ).collect()
    }
    want = {}
    for i, a in enumerate(words):
        cands = [
            (_lev(a, b), j + 10_000)
            for j, b in enumerate(words)
            if _hamming(a, b) <= 2
        ]
        if cands:
            d, rid = min(cands)
            want[i] = (rid, d)
    assert got == want
