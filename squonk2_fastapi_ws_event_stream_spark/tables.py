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
    # events.ts is TIMESTAMP(NANOS) in parquet → read as long nanos
    # (nanosAsLong conf) and convert with exact integer division. DuckDB
    # truncates nanos→micros the same way.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def fan_out(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a narrow input across all cores before CPU-heavy per-row work.

    Local test parquet is a single row-group → one task, which serializes
    compute-bound operators (shingling, simhash, vector math). On a real
    cluster the input already has thousands of splits, so the repartition
    is skipped (only applied when the scan has fewer partitions than the
    available parallelism). The shuffled payload is the narrow pre-compute
    projection — cheap relative to the compute it parallelizes.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
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
