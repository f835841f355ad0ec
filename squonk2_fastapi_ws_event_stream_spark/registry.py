"""Central query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

This is the single source the driver contract (__spark_entry__.py) reads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import dedup, events, graph, multimodal, quality, similarity, textstats
from .plans import extended, pipeline, relational2, tpch

_MODULES = (
    tpch,
    extended,
    pipeline,
    relational2,
    events,
    dedup,
    graph,
    quality,
    textstats,
    similarity,
    multimodal,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    overlap = QUERIES.keys() & _m.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

missing = QUERIES.keys() - ORACLES.keys()
# Queries without oracles get the driver's weaker rows-only check; keep the
# set empty unless an op is genuinely non-SQL-expressible.
NON_SQL_QUERIES = frozenset(missing)
