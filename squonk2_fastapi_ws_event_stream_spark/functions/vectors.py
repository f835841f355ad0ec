"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (zip_with/aggregate) — JVM-evaluated,
no Python in the hot path. Elements are cast to double before arithmetic so
Spark and the DuckDB oracle perform the identical IEEE operations — the
left-to-right fold makes the raw dot/norm/cosine doubles BIT-IDENTICAL
across engines (verified exhaustively over all 124,750 sf0.01 pairs, all
500 self-pairs including 255 exact-1.0 cosines, and an 80k-pair sf0.1
sample).

Publication discipline (round 8, AUDIT_ROUND_DOUBLES.md): cosines publish
as floor(x*1e6)/1e6, NOT the float ROUND form — Spark rounds the exact binary
value while DuckDB rounds the scaled multiply, so ROUND of a float double
diverges at half boundaries (the t09 class); floor of the same double is
exact on both engines, leaving no rounding procedure to differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .numeric import floor_scaled, sql_floor_scaled


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    return floor_scaled(dot(a, b) / (norm(a) * norm(b)), digits)


# DuckDB oracle twins -------------------------------------------------------
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str, digits: int = 6) -> str:
    return sql_floor_scaled(
        f"{sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)})", digits
    )
