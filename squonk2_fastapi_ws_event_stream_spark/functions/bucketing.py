"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the fact⋈fact join (lineitem⋈orders on orderkey) shuffles both
sides every query. Bucketing pays that shuffle ONCE at write time: both
tables are hash-bucketed (and sorted) on the join key, so every subsequent
join is a zero-exchange sort-merge of aligned buckets. The bucket count is
the write-time parallelism floor — pick ~2× target executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planner
    elides both exchanges (verify with explain: no Exchange above either
    scan)."""
    return spark.table(left_table).join(spark.table(right_table), on)
