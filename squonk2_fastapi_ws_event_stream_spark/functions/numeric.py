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


# ---------------------------------------------------------------------------
# Cross-engine float publishers (round-8 conversion, AUDIT_ROUND_DOUBLES.md).
#
# ROUND(x, n) on a float-derived double is engine-UNSAFE in a checked
# column: Spark rounds the exact binary value (BigDecimal HALF_UP) while
# DuckDB rounds the scaled multiply x*10^n, so a value near a half
# boundary rounds differently (the t09 incident — one sf0.1 row, green at
# every smaller SF). floor-of-scaled removes the asymmetry instead of
# hoping the data stays off the boundary: both engines compute the same
# double x (per-row IEEE expressions and fixed-order folds are
# bit-identical — verified exhaustively over all 124,750 sf0.01 cosine
# pairs and an 80k-pair sf0.1 sample), the same scaled multiply, and
# floor of the same double is EXACT — no rounding procedure is left to
# differ. The published value floor(x*10^d)/10^d is an integer-valued
# double divided by the same power of ten on both engines: same integer,
# same quotient, same string.
#
# For ratios of integers, prefer exact integer micros with truncating
# division (`x * 1_000_000 DIV y` published as /1e6) — fully exact, no
# float multiply at all. floor_scaled is for floats with no integer form
# (cosine/sqrt/norm families).
# ---------------------------------------------------------------------------
# The trailing `+ 0.0` normalizes IEEE negative zero: DuckDB's FLOOR
# returns a double (FLOOR(-0.0) = -0.0, and -0.0/1e6 = -0.0) while
# Spark's floor returns a LONG (0), so a -0.0 input would publish
# "-0.0" vs "0.0" and hash-mismatch. -0.0 + 0.0 = +0.0 and y + 0.0 = y
# otherwise, so the term is exact everywhere (hypothesis-tested).
def floor_scaled(x: Column, digits: int = 6) -> Column:
    """Publish a float-derived double at `digits` decimals, engine-safely.

    Contract: FINITE inputs only.  Spark's floor(double) returns LONG, so
    a non-finite x diverges from the DuckDB twin (Inf -> long-max/1e6,
    NaN -> 0.0 vs DuckDB keeping Inf/NaN).  The guard lives upstream:
    every caller's denominator comes from an embedding norm, and
    tests/test_floor_scaled_properties.py pins both the divergence and
    the data invariant (no zero/non-finite embedding norms at any SF)
    that keeps inputs finite."""
    scale = F.lit(float(10**digits))
    return F.floor(x * scale) / scale + F.lit(0.0)


def sql_floor_scaled(x: str, digits: int = 6) -> str:
    """DuckDB twin of floor_scaled — textually the same arithmetic."""
    scale = f"{10**digits}.0"
    return f"(FLOOR(({x}) * {scale}) / {scale} + 0.0)"
