"""Distributed exact quantiles by histogram-pruned selection.

Spark's exact ``percentile()`` aggregate buffers EVERY input value in a
single aggregation buffer (one OpenHashMap per function instance, merged
onto one task) — fine at test scale, structurally job-fatal at 100 TB.
The scale-correct way to get an exact order statistic out of a huge
column is SELECTION, not aggregation:

1. one scan for (min, max, count);
2. one scan for a FIXED-width histogram (``N_BUCKETS`` counters,
   map-side combined — the shuffle carries at most N_BUCKETS rows no
   matter the input size);
3. locate the bucket holding the target rank in the collected histogram
   (driver-side, fixed-size by construction — the t34/x06 discipline);
4. take-ordered the j smallest values INSIDE that one bucket (a
   1/N_BUCKETS slice of the data on average) and read the j-th.

Identical-value pileups (a bucket that cannot be subdivided because
min == max inside it) resolve immediately — every value in the bucket
IS the answer. Skewed-but-divisible buckets recurse one more histogram
level, narrowing the value range each time, so the per-rank take-ordered
never materializes more than ``TAKE_CAP`` rows on one task.

The interpolated (``quantile_cont``) percentile then combines the two
adjacent order statistics with the same ``lo + frac * (hi - lo)``
expression both Spark and DuckDB use; callers round once at the end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 4096
# Above this many rows in the located bucket, recurse another histogram
# level instead of take-ordering the bucket directly.
TAKE_CAP = 2_000_000
MAX_DEPTH = 8


def _kth_smallest(
    df: DataFrame, col: str, k: int, lo: float, hi: float, n_range: int, depth: int = 0
) -> float:
    """Exact k-th smallest (1-indexed) of `df[col]` within [lo, hi]."""
    if lo == hi:
        return lo
    if n_range <= TAKE_CAP or depth >= MAX_DEPTH:
        # No range re-filter here: `df` IS the row set whose count is
        # n_range — at the top level it's the whole column, in recursion
        # it's the parent's floor()-bucket filter. Re-filtering by
        # [lo, hi] could disagree with floor() at float bucket edges and
        # shift the k-th value (or strand fewer than k rows).
        row = (
            df.orderBy(F.col(col).asc())
            .limit(k)
            .agg(F.max(col).alias("v"))
            .collect()[0]
        )
        return float(row["v"])
    width = (hi - lo) / N_BUCKETS
    # Clamp BOTH ends: [lo, hi] are derived bucket edges, and a row kept
    # by the parent's floor()-bucket filter can sit an ulp outside them —
    # clamping (instead of range-filtering) guarantees every row of `df`
    # lands in exactly one bucket, so the histogram total equals n_range
    # and the rank bookkeeping is exact.
    bucket = F.greatest(
        F.lit(0),
        F.least(F.lit(N_BUCKETS - 1), F.floor((F.col(col) - lo) / width)),
    )
    hist = (
        df.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = {int(r["b"]): int(r["c"]) for r in hist}
    cum = 0
    for b in range(N_BUCKETS):
        c = counts.get(b, 0)
        if cum + c >= k:
            sub_lo = lo + b * width
            sub_hi = hi if b == N_BUCKETS - 1 else lo + (b + 1) * width
            # Filter with the SAME clamped bucket expression the histogram
            # counted with — sub's row count is exactly c by construction.
            sub = df.filter(bucket == b)
            return _kth_smallest(sub, col, k - cum, sub_lo, sub_hi, c, depth + 1)
        cum += c
    raise AssertionError("rank beyond histogram total")  # pragma: no cover


def exact_percentiles(
    df: DataFrame, col: str, pcts: tuple[float, ...]
) -> tuple[int, dict[float, float]]:
    """(n, {p: exact interpolated percentile}) — quantile_cont semantics,
    computed by distributed selection (module docstring). The returned
    values are UNROUNDED; apply the engine-side ROUND once at use."""
    stats = df.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    # Collect the order-statistic indices every percentile needs.
    needed: set[int] = set()
    plan: dict[float, tuple[int, int, float]] = {}
    for p in pcts:
        r = p * (n - 1)
        lo_idx = int(math.floor(r)) + 1  # 1-indexed
        frac = r - math.floor(r)
        hi_idx = min(lo_idx + 1, n) if frac > 0 else lo_idx
        plan[p] = (lo_idx, hi_idx, frac)
        needed.update((lo_idx, hi_idx))
    values = {k: _kth_smallest(df, col, k, lo, hi, n) for k in sorted(needed)}
    out = {}
    for p, (lo_idx, hi_idx, frac) in plan.items():
        v_lo, v_hi = values[lo_idx], values[hi_idx]
        out[p] = v_lo + frac * (v_hi - v_lo)
    return n, out


# Per-corpus memo: the exact-percentile scalars are the artifact a real
# pipeline computes once and reuses (x15's sweep, regression gates, SLA
# checks); keyed like dedup._SIG_CACHE but holding plain floats, so there
# is nothing to unpersist.
_PCT_CACHE: dict[tuple, tuple[int, dict[float, float]]] = {}


def staged_exact_percentiles(
    spark: SparkSession,
    sf_dir: str,
    table_name: str,
    col: str,
    pcts: tuple[float, ...],
) -> tuple[int, dict[float, float]]:
    from ..tables import table

    key = (sf_dir, table_name, col, pcts)
    if key not in _PCT_CACHE:
        _PCT_CACHE[key] = exact_percentiles(
            table(spark, sf_dir, table_name).select(col), col, pcts
        )
    return _PCT_CACHE[key]
