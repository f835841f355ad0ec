"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL, sorts columns by name and rows by
value, and compares cell-by-cell with exact equality (floats must match
bit-for-bit — the engine is designed for that; see functions/numeric.py).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    got = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(oracle_sql).fetchdf()
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return problems
    g, w = _normalize(got), _normalize(want)
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    problems.append(
                        f"col {col} row {i}: spark={a!r} oracle={b!r} (diff={a - b!r})"
                    )
                    break
            elif str(a) != str(b):
                problems.append(f"col {col} row {i}: spark={a!r} oracle={b!r}")
                break
    return problems
