"""The correctness gate, locally: every registered query must match its
DuckDB oracle exactly (same check shape the driver runs at sf0.01; we run
sf0.001 in CI for speed — set ORACLE_PARITY_SF=/root/testdata/sf0.01 to
match the driver bit-for-bit).
"""

from __future__ import annotations

import os

import pytest

from squonk2_fastapi_ws_event_stream_spark.registry import ORACLES, QUERIES

from .oracle_compare import compare

SF_DIR = os.environ.get("ORACLE_PARITY_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
        return
    problems = compare(QUERIES[name](spark, SF_DIR), ORACLES[name], SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems[:5])
