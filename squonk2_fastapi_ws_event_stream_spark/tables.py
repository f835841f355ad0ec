"""Test-table catalog: the driver's TPC-H-ish parquet tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets native parquet
scans with predicate pushdown + column pruning; no caching (at 100 TB the
tables don't fit, and re-scan with pruning beats a cold cache).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_session_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame (native parquet scan)."""
    apply_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Timestamp columns have appeared in three physical encodings across
    # driver data regenerations; normalize all of them to a session-UTC
    # TIMESTAMP so every downstream unix_millis()/window() call sees one
    # type:
    #   - TIMESTAMP(NANOS)    → bigint under nanosAsLong → exact DIV 1000
    #     (only events.ts has ever used this encoding)
    #   - timestamp[us] no-tz → TIMESTAMP_NTZ → cast (exact: session tz is
    #     pinned UTC in session.py, so NTZ→LTZ is the identity mapping)
    #   - timestamp[us] w/ tz → already TIMESTAMP, no-op
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def fan_out(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a narrow input across all cores before CPU-heavy per-row work.

    Local test parquet is a single row-group → one task, which serializes
    compute-bound operators (shingling, simhash, vector math). On a real
    cluster the input already has thousands of splits, so the repartition
    is skipped (only applied when the scan has fewer input files than the
    available parallelism). The shuffled payload is the narrow pre-compute
    projection — cheap relative to the compute it parallelizes.

    The probe is ``df.inputFiles()`` (metadata-only), not ``df.rdd`` —
    touching ``.rdd`` forces a full plan conversion on the driver per call.
    A many-files scan may still split each file by maxPartitionBytes, but a
    scan with >= target files never needs widening, which is the only
    decision made here.
    """
    target = spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files < target:
        return df.repartition(target)
    return df


# Row bound above which the deliberately-quadratic ground-truth verifiers
# (t04 all-pairs Jaccard, v01 all-pairs cosine) refuse to run. They exist to
# validate the linear-scale paths (t02/t06 LSH bands, v08 SRP-LSH) at test
# scale; at 100 TB an all-pairs join is never the answer, so the refusal is
# structural rather than conventional.
ALLPAIRS_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_ALLPAIRS_MAX_ROWS", "100000"))


def guard_all_pairs(
    df: DataFrame, op: str, scale_alternative: str, bound: int | None = None
) -> DataFrame:
    """Refuse to run an O(n²) verifier above ``bound`` input rows.

    The probe is ``limit(bound+1).count()`` — it stops scanning after
    bound+1 rows, so the guard itself stays cheap on a huge table.
    """
    bound = ALLPAIRS_MAX_ROWS if bound is None else bound
    n = df.limit(bound + 1).count()
    if n > bound:
        raise ValueError(
            f"{op} is an all-pairs (O(n^2)) ground-truth verifier and refuses "
            f"inputs above {bound} rows (got >{bound}). Use the linear-scale "
            f"path instead: {scale_alternative}. Override via "
            f"SPARK_GRAFT_ALLPAIRS_MAX_ROWS or the bound= argument."
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table present in ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` access."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
