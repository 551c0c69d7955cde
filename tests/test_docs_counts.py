"""Documentation counts must equal catalog introspection (no rot).

README.md and COVERAGE.md quote the number of catalog queries and oracle
checks; two rounds in a row those numbers went stale. `tools/gen_coverage.py`
regenerates them; this test fails whenever the quoted numbers diverge from
the live catalog, which forces the regeneration to happen in the same commit
that changes the catalog.
"""

from __future__ import annotations

import re


def test_readme_and_coverage_counts_match_catalog():
    import tools.gen_coverage as gc

    c = gc.counts()
    assert c["queries"] >= 114 and c["oracles"] >= 111  # never shrink

    import os

    for fname, pattern, template in gc.REWRITES:
        with open(os.path.join(gc.REPO, fname)) as f:
            text = f.read()
        want = template.format(**c)
        found = re.findall(pattern, text)
        assert found, f"{fname}: counts phrase missing (pattern {pattern!r})"
        assert found == [want] * len(found), (
            f"{fname}: stale counts {found}, catalog says {want!r} — "
            "run python tools/gen_coverage.py"
        )


def test_gen_coverage_check_mode_passes():
    import tools.gen_coverage as gc

    assert gc.apply(check=True) == 0


def test_bench_headline_set_is_stable():
    """BENCH_r{N} comparisons across rounds require the same 8 headline
    queries; adding queries to the bench set silently inflates the total
    and reads as a regression. New operators publish through SCALE_PROOF
    / tools instead."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded

    _ensure_loaded()
    bench = {n for n, s in QUERIES.items() if s.bench}
    assert bench == {
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_local_supplier_volume",
        "q31_split_adjust",
        "q34_indicators",
        "q35_vwap_signals",
        "q41_minhash_lsh_dedup",
        "q45_ann_bruteforce",
    }
