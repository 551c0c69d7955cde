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
