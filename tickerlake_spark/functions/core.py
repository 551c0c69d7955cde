"""Core expression library — pure Spark SQL expressions, no Python UDFs.

Each helper pins one of the reference's semantics gotchas (SURVEY §4.3) as a
reusable Column expression so every operator gets oracle-exact behavior:

- rolling means are null until the window is full (Polars min_samples
  semantics, reference: silver/indicators.py:10-25);
- the product aggregate (stacked split factors, reference:
  silver/splits.py:77) has no Spark builtin — expressed as exp(sum(log));
- unsigned-integer truncation on division (reference: silver/splits.py:92-97,
  silver/indicators.py:88) becomes floor().cast(long).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "epoch_ms_to_date",
    "nondet_identity",
    "stable_round",
    "floor_div_long",
    "product",
    "rolling_mean_strict",
    "rolling_window",
    "true_range",
]


def nondet_identity(col: Column) -> Column:
    """Value-preserving wrapper that marks an expression non-deterministic —
    the guide-§4.4 "stop the optimizer duplicating an expensive expression"
    technique for built-in expressions (UDFs have ``asNondeterministic``;
    Columns have no public equivalent).

    ``WHEN monotonically_increasing_id() >= 0 THEN col`` is true for every
    row (both halves of the id are non-negative), so the value is untouched
    — but the optimizer may not push filters through, collapse, or
    duplicate a projection containing it. Used where filter pushdown would
    otherwise substitute an expensive alias (an interpreted HOF pipeline)
    into each pushed conjunct, re-evaluating it per reference. A rand()-
    based guard does NOT work: Spark 4 simplifies always-true rand
    comparisons away before pushdown runs.

    Cost: one long counter read + compare per row. The wrapped column's
    type is unchanged; its nullability becomes True (WHEN without ELSE),
    which callers must tolerate. Apply ONLY where the duplication is the
    measured problem — the wrapper also blocks pushdown of unrelated
    predicates through the same projection.
    """
    return F.when(F.monotonically_increasing_id() >= 0, col)


def stable_round(col: Column, n: int) -> Column:
    """Round to ``n`` decimals with the half-way boundary nudged off the data
    grid: ``round(x + 5*10^-(n+3), n)``.

    Cross-engine float aggregates agree only to ~1e-10 (different summation
    orders), and data-derived rationals (2-decimal prices / integer volumes)
    can land EXACTLY on a round-half boundary, where Spark's BigDecimal
    HALF_UP and DuckDB's float-domain round disagree. Shifting the boundary
    by half a sub-grid step puts it 5*10^-(n+3) away from every value the
    data can produce — 50-1000x the cross-engine noise. Valid for
    non-negative values (all query outputs here). The SQL oracles inline the
    same expression: ``ROUND(x + 5e-9, 6)`` / ``ROUND(x + 5e-7, 4)``.
    """
    return F.round(col + F.lit(5.0 * 10 ** -(n + 3)), n)


def epoch_ms_to_date(col: Column | str) -> Column:
    """Epoch-milliseconds -> DateType (UTC).

    Reference: bronze/transformers.py:72 (cast Datetime('ms') then Date).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.timestamp_millis(c))


def floor_div_long(numerator: Column, denominator: Column) -> Column:
    """Truncating division to long — replicates the reference's
    float -> UInt64 cast (truncation toward zero; all inputs here are
    non-negative so floor == trunc). Reference: silver/splits.py:92-97."""
    return F.floor(numerator / denominator).cast("long")


def product(col: Column | str) -> Column:
    """Product aggregate via exp(sum(log)).

    Valid for strictly positive inputs (split ratios always are,
    reference: silver/splits.py:77). Exact enough for the $0.01 oracle
    tolerance; for a bit-exact product use
    ``F.aggregate(F.collect_list(c), F.lit(1.0), lambda a, x: a * x)`` at the
    cost of materializing the list.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.sum(F.log(c)))


def rolling_window(
    partition_cols: list[str], order_cols: list[str], n: int
) -> WindowSpec:
    """Trailing n-row window (current row inclusive)."""
    return (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), 0)
    )


def rolling_mean_strict(
    col: Column | str,
    n: int,
    partition_cols: list[str],
    order_cols: list[str],
) -> Column:
    """Trailing n-row mean, null until n rows are present in the partition.

    Polars ``rolling_mean(window_size=n)`` defaults min_samples == n, so the
    first n-1 rows per group are null (reference: silver/indicators.py:10-25).
    Spark's ``avg over rowsBetween`` emits partial averages, so we mask on the
    window row count.

    The mean is ``sum/n``, not ``avg`` (optimization r11, guide §2.3): Spark
    recomputes a sliding frame's aggregation buffer from scratch for every
    output row (SlidingWindowFunctionFrame has no retract path), so buffer
    width is the inner-loop cost — Average maintains (sum, count) where Sum
    maintains just the sum. Under the count==n mask the two are bitwise
    identical: both accumulate the same doubles left-to-right and divide the
    identical sum by exactly n (Average divides by count cast to double,
    which the mask pins to n).
    """
    c = F.col(col) if isinstance(col, str) else col
    w = rolling_window(partition_cols, order_cols, n)
    return F.when(F.count(c).over(w) == n, F.sum(c).over(w) / n)


def true_range(
    high: Column | str, low: Column | str, prev_close: Column | str
) -> Column:
    """True range = max(high-low, |high-prev_close|, |low-prev_close|);
    falls back to high-low on the first row (null prev_close).

    Reference: silver/indicators.py:47-52 (max_horizontal ignores nulls, so a
    null prev_close leaves high-low; F.greatest also skips nulls).
    """
    h = F.col(high) if isinstance(high, str) else high
    lo = F.col(low) if isinstance(low, str) else low
    pc = F.col(prev_close) if isinstance(prev_close, str) else prev_close
    return F.greatest(h - lo, F.abs(h - pc), F.abs(lo - pc))
