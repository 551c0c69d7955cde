"""Property-based tests for the lakehouse mutation primitives.

Random batch sequences against pure-Python oracles:
- upsert_table: any sequence of keyed update batches must leave the table
  equal to a dict fold (last write per key wins), partitioned or not;
- incremental aggregate maintenance: merging per-batch partial states must
  equal aggregating everything at once, for ANY partition of the rows into
  batches (the associativity/commutativity the design depends on).

Examples are few and small — every example runs real Spark jobs.
"""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def update_batches(draw):
    """1-4 batches of (id, part, value) rows, ids unique within a batch."""
    n_batches = draw(st.integers(1, 4))
    batches = []
    for _ in range(n_batches):
        ids = sorted(draw(st.sets(st.integers(0, 14), min_size=1, max_size=8)))
        batch = [
            (
                i,
                f"p{draw(st.integers(0, 2))}",
                draw(st.integers(-1000, 1000)) / 4.0,
            )
            for i in ids
        ]
        batches.append(batch)
    return batches


@settings(**SETTINGS)
@given(batches=update_batches(), partitioned=st.booleans())
def test_upsert_sequence_equals_dict_fold(spark, tmp_path_factory, batches, partitioned):
    from tickerlake_spark.storage.upsert import upsert_table

    path = str(tmp_path_factory.mktemp("upsert_prop") / "t")
    oracle: dict[int, tuple[str, float]] = {}
    for batch in batches:
        df = spark.createDataFrame(batch, "id long, part string, v double")
        upsert_table(
            spark,
            path,
            df,
            keys=["id"],
            partition_by="part" if partitioned else None,
        )
        for i, p, v in batch:
            oracle[i] = (p, v)

    got = {
        r.id: (r.part, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == oracle


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.integers(-100, 100),  # value
            st.integers(0, 2),  # batch assignment
        ),
        min_size=1,
        max_size=40,
    )
)
def test_incremental_agg_invariant_under_batching(spark, rows):
    from pyspark.sql import functions as F

    from tickerlake_spark.operators.incremental_agg import (
        aggregate_delta,
        merge_aggregates,
    )

    measures = {
        "s": ("sum", "v"),
        "c": ("count", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    df = spark.createDataFrame(
        [(g, float(v), b) for g, v, b in rows], "g long, v double, b long"
    )

    state = None
    for b in range(3):
        batch = df.filter(F.col("b") == b).drop("b")
        if batch.rdd.isEmpty():
            continue
        state = merge_aggregates(
            state, aggregate_delta(batch, ["g"], measures), ["g"], measures
        )

    oracle = defaultdict(list)
    for g, v, _b in rows:
        oracle[g].append(v)

    assert state is not None
    got = {r.g: (r.s, r.c, r.mn, r.mx) for r in state.collect()}
    assert set(got) == set(oracle)
    for g, vals in oracle.items():
        s, c, mn, mx = got[g]
        assert math.isclose(s, sum(vals), abs_tol=1e-9)
        assert c == len(vals)
        assert mn == min(vals) and mx == max(vals)
