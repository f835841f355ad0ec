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


# Fixed head size for `head_tail_freq_join`. 1024 keys × a few numeric
# columns is a few tens of KB — broadcast-safe BY CONSTRUCTION at any
# corpus size (the t34 fixed-bucket discipline), unlike a full-vocabulary
# broadcast, which grows with the corpus and trips Spark's 8 GB hard cap
# long before 100 TB.
FREQ_HEAD_K = 1024


def head_tail_freq_join(
    probe: DataFrame,
    lut: DataFrame,
    on: str,
    order_col: str,
    head_k: int = FREQ_HEAD_K,
) -> DataFrame:
    """Split-frequency equi-join for Zipfian lookup tables.

    Token/bigram frequency tables are power-law: a plain shuffle join
    keys the ENTIRE probe side by the token, and the hottest keys (stop
    words) concentrate on a handful of reducers — the classic skew
    straggler. A full-table broadcast is the other failure mode (the
    vocabulary grows with the corpus; unbounded broadcasts are job-fatal
    at scale — see SCALING.md "broadcast hint rule").

    The split takes both escapes at once:

    - HEAD = the `head_k` hottest keys by `order_col` (deterministic
      tie-break on the key). Fixed size by construction → broadcast-safe
      forever. Under Zipf, these cover the overwhelming majority of probe
      ROWS, which therefore never shuffle: they join broadcast-hash and
      keep the probe's upstream partitioning.
    - TAIL = everything else, shuffle-joined. Skew-free by construction:
      the tail's hottest key is at most as frequent as the head's
      coldest, so no reducer hot-spots remain for AQE to split.

    The output is the same multiset of rows as ``probe JOIN lut USING
    (on)`` — head/tail membership never changes a joined value, so
    oracles are unaffected. Callers should persist/stage `lut` (it is
    referenced three times: head top-k, head anti for the probe split,
    head anti for the tail) — see `tokens_table` / `_stage_cached`.
    """
    head = lut.orderBy(F.col(order_col).desc(), F.col(on)).limit(head_k)
    head_keys = F.broadcast(head.select(on))
    hit = probe.join(F.broadcast(head), on)
    miss = probe.join(head_keys, on, "left_anti").join(
        lut.join(head_keys, on, "left_anti"), on
    )
    return hit.unionByName(miss)
