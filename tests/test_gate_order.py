"""Gate-order generation invariants (VERDICT r3 item 3).

The driver runs the correctness gate in catalog dict order under a time
budget (~50 queries/round), so ordering is evidence routing. Rounds 1-3
hand-rotated a static list and twice left registered queries stranded in an
unreachable tail. The order is now GENERATED from the union of
CORRECTNESS_r*.json: never-green-checked queries first, green regression
fill after. These tests pin that contract.
"""

from __future__ import annotations

from tickerlake_spark.plans.catalog import (
    QUERIES,
    _COST_RANK,
    _ensure_loaded,
    driver_green_queries,
    gate_order,
)


def test_every_registered_query_appears_exactly_once():
    _ensure_loaded()
    order = gate_order(list(QUERIES))
    assert sorted(order) == sorted(QUERIES)
    assert len(order) == len(set(order))


def test_never_green_queries_run_strictly_first():
    _ensure_loaded()
    green = driver_green_queries()
    order = gate_order(list(QUERIES))
    tiers = [name in green for name in order]
    assert tiers == sorted(tiers), (
        "a never-green query is scheduled after a green one — the driver's "
        "time budget could strand it without a correctness row"
    )


def test_catalog_dict_order_is_the_gate_order():
    """The driver iterates queries() dict order — it must BE gate_order."""
    _ensure_loaded()
    assert list(QUERIES) == gate_order(list(QUERIES))


def test_new_unranked_queries_lead_their_tier():
    """A query missing from _COST_RANK (i.e. newly registered) must sort at
    the head of its tier so it gets driver evidence the same round it lands."""
    _ensure_loaded()
    names = list(QUERIES) + ["q999_brand_new"]
    order = gate_order(names)
    green = driver_green_queries()
    ungreen = [n for n in order if n not in green]
    assert ungreen[0] == "q999_brand_new"


def test_cost_rank_has_no_unknown_names():
    """_COST_RANK entries must all be live catalog names (catch renames)."""
    _ensure_loaded()
    stale = [n for n in _COST_RANK if n not in QUERIES]
    assert not stale, f"stale names in _COST_RANK: {stale}"


def test_green_tier_rotates_least_recently_checked_first():
    """VERDICT r6 item 2: within the green regression tier, a query whose
    last driver check is older must run BEFORE one checked more recently —
    the ~50-query budget then sweeps the whole catalog across rounds instead
    of freezing on the cheap half."""
    from tickerlake_spark.plans.catalog import driver_checked_rounds

    _ensure_loaded()
    green = driver_green_queries()
    checked = driver_checked_rounds()
    order = gate_order(list(QUERIES))
    green_tail = [n for n in order if n in green]
    rounds = [checked.get(n, 0) for n in green_tail]
    assert rounds == sorted(rounds), (
        "green tier is not least-recently-checked-first: a recently-checked "
        "query is scheduled ahead of a staler one"
    )
    # the rotation must be live: with r1..r6 evidence on disk the green tier
    # cannot be one flat recency class (that would mean the parse failed)
    assert len(set(rounds)) > 1


def test_next_driver_sample_mostly_differs_from_last_round():
    """The concrete 'done' bar from VERDICT r6: the next round's ~50-query
    prefix must contain >=40 queries NOT in the latest round's sample."""
    import glob
    import json
    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    files = sorted(glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:
        return
    with open(files[-1]) as f:
        last_sample = set(json.load(f))
    _ensure_loaded()
    prefix = gate_order(list(QUERIES))[:50]
    fresh = [n for n in prefix if n not in last_sample]
    assert len(fresh) >= 40, (
        f"only {len(fresh)} of the next 50 are new vs the last driver sample"
    )
