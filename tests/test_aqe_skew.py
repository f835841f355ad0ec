"""AQE skew-join proof: the runtime half of the skew story.

functions/skew.py handles skew the STATIC way (salting, two-phase agg)
for cases the author can predict. This test proves the RUNTIME path the
repo's scaling docs lean on — `spark.sql.adaptive.skewJoin` splitting a
hot partition into parallel sub-joins — actually engages on this
engine's session config (it is the mechanism SCALING.md cites whenever a
join is left hint-free "with AQE runtime handling"). Thresholds are
lowered to make a test-sized hot key cross the skew bar; at production
defaults the same plan rewrite fires at 256 MB partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ, not BHJ
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # keep AQE from folding everything into one partition first
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4KB",
}


def test_aqe_splits_the_hot_key_join(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        # 50k rows on ONE hot key + 5k uniform rows; dim side uniform.
        left = spark.range(0, 55_000).select(
            F.when(F.col("id") < 50_000, F.lit(0))
            .otherwise(F.col("id") % 1_000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = left.join(right, "k")
        rows = joined.collect()
        assert len(rows) == 55_000  # every left row matches exactly one dim
        hot = sum(1 for r in rows if r["k"] == 0)
        assert hot == 50_005

        # the EXECUTED adaptive plan (same QueryExecution the collect ran)
        # must mark the hot partition skew-split
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan[:2000]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
