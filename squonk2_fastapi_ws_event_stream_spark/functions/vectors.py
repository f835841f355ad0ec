"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (zip_with/aggregate) — JVM-evaluated,
no Python in the hot path. Elements are cast to double before arithmetic so
Spark and the DuckDB oracle perform the identical IEEE operations; final
cosines are rounded to 6 decimals, far above the ~1e-15 summation-order
noise, so cross-engine comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), digits)


# DuckDB oracle twins -------------------------------------------------------
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str, digits: int = 6) -> str:
    return f"ROUND({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}), {digits})"
