"""Property tests for the round-8 cross-engine float publishers.

floor_scaled / sql_floor_scaled are the load-bearing primitives of the
class-2 ROUND-on-double conversion (AUDIT_ROUND_DOUBLES.md): given the
SAME input double, Spark's floor(x*1e6)/1e6 and DuckDB's textual twin
must produce the SAME published double — including on exact 1e-6 grid
points (where ROUND was safe but floor is the boundary), at half
boundaries (where ROUND diverged — the t09 class), on negatives, and
on magnitudes up to the exactness limit of the scaled multiply.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# |x*1e6| must stay exact-floorable; cosines/norms/dots live in ±1e6.
DOUBLES = st.one_of(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    # adversarial: exact grid points and half boundaries
    st.integers(min_value=-2_000_000, max_value=2_000_000).map(
        lambda k: k / 1e6
    ),
    st.integers(min_value=-2_000_000, max_value=2_000_000).map(
        lambda k: (k + 0.5) / 1e6
    ),
)


def py_floor_scaled(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


@pytest.fixture(scope="module")
def batch_eval(spark):
    from squonk2_fastapi_ws_event_stream_spark.functions.numeric import (
        floor_scaled,
        sql_floor_scaled,
    )

    con = duckdb.connect()

    def run(xs: list[float]) -> None:
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(x,) for x in xs], "x double")
        got_spark = [
            r["y"] for r in df.select(floor_scaled(F.col("x")).alias("y"))
            .collect()
        ]
        sql = sql_floor_scaled("x")
        got_duck = [
            con.execute(f"SELECT {sql} AS y FROM (SELECT ? AS x)", [x]).fetchone()[0]
            for x in xs
        ]
        want = [py_floor_scaled(x) for x in xs]
        for x, s, d, w in zip(xs, got_spark, got_duck, want):
            assert str(s) == str(d) == str(w), (x, s, d, w)

    return run


@settings(max_examples=30, deadline=None)
@given(st.lists(DOUBLES, min_size=1, max_size=40))
def test_floor_scaled_cross_engine_bit_equal(batch_eval, xs):
    batch_eval(xs)


def test_floor_scaled_known_hard_cases(batch_eval):
    batch_eval(
        [
            1.0,  # exact grid (the 255 duplicate-cosine case)
            -1.0,
            0.0,
            0.8249745,  # the t09 half-boundary shape
            -0.8249745,
            0.9999995,
            0.3,  # 0.3*1e6 rounds BELOW the integer in IEEE
            -0.3,
            2.5e-7,
            -2.5e-7,
            999999.9999999999,
        ]
    )
