"""Skew-mitigation helpers for hot-key joins and aggregations.

At 100 TB a handful of hot keys (a viral document source, one giant
customer) can pin a join or aggregation onto one straggler task. Two
standing remedies beyond AQE's runtime skew-join splitting (which the
session enables by default):

- `salted_join`: explicit N-way salting — the probe side gets a random
  salt in [0, N), the build side is replicated N times, and the join key
  becomes (key, salt). Deterministic alternative when AQE can't see the
  skew (e.g. the skew appears after a filter AQE's stats predate).
- `two_phase_agg`: salt → partial aggregate → final aggregate. For
  algebraic aggregates (sum/count/min/max) over extremely hot group keys.

Both are plain DataFrame transforms — no RDDs, fully Catalyst-visible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated across `n_salts` buckets.

    Use when `build` is too large to broadcast and `probe[on]` is skewed.
    The replication multiplies build-side shuffle volume by n_salts — pick
    the smallest N that flattens the stragglers.
    """
    salted_probe = probe.withColumn(
        SALT, (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT)
    replicated_build = build.select("*", salts)
    out = salted_probe.join(replicated_build, [on, SALT], how)
    return out.drop(SALT)


_MERGERS = {"sum": F.sum, "min": F.min, "max": F.max}


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for algebraic aggregates.

    `aggs` maps output name → (partial aggregate expression, merge fn) with
    merge fn one of 'sum' | 'min' | 'max' (counts merge by 'sum').
    """
    salted = df.withColumn(SALT, (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT).agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    finals = [
        _MERGERS[merge_fn](F.col(f"__p_{name}")).alias(name)
        for name, (_, merge_fn) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*finals)
