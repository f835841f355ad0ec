"""SparkSession factory.

Scale design notes (targets a 1000-executor cluster at ~100 TB; tested on
local[32]):

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts.
- UTC session timezone, always: the reference's datetime-seek quirk
  (/root/reference/app/app.py:238 uses process-local tz via ``time.mktime``)
  is fixed per SURVEY §2.2 — we pin UTC explicitly.
- Arrow enabled for the few pandas-UDF paths (multimodal decode, flexible
  datetime parse); everything else stays JVM-side / whole-stage-codegen.
- Shuffle/IO compression stays at the lz4 default here: at bench SFs the
  shuffles are KB-MB scale so a codec A/B measures nothing but noise. At
  100 TB the text-heavy shuffle payloads (shingles, tokens, band rows)
  are exactly the case where zstd's ratio pays for its CPU — set
  spark.io.compression.codec=zstd cluster-side and measure shuffle bytes
  vs stage time per the optimization guide (§2.3) before committing it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Static (context-creation-only) conf: lives outside ENGINE_CONF because
# apply_session_conf can never set it on a live externally-built session.
# The UI's listener bus serializes an event per task; with 32 local
# threads and thousands of sub-second tasks that bookkeeping is a
# measured ~15% of whole-suite wall time (SCALING.md "Round-9 UI-off
# A/B": min-of-3 alternating fresh sessions, every one of 16 sampled
# queries improved, 0.73-0.93x). Nothing in the engine, tests, or bench
# reads the UI; a debugging session can re-enable it explicitly.
BUILDER_CONF: dict[str, str] = {
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}

ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB scan splits: good balance of task count vs overhead for
    # columnar parquet at any SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # The driver's events.parquet stores TIMESTAMP(NANOS); read as long and
    # convert exactly in tables.py (Spark has no nanos timestamp type).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Driver data regenerations have also produced timestamp[us] with no tz,
    # which Spark 4.x infers as TIMESTAMP_NTZ; read as TIMESTAMP (exact under
    # the UTC session tz above). tables.py additionally normalizes the dtype
    # so sessions built without this conf still behave.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def _export_package_path() -> str:
    """Make this package importable by Spark's spawned Python workers.

    The custom DataSource class is cloudpickled by reference and unpickled
    inside worker processes, which only see PYTHONPATH — not the launching
    script's sys.path. Without this, any process started outside the repo
    root fails with ModuleNotFoundError at query start.
    """
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )
    return pkg_parent


def get_spark(app_name: str = "squonk2-ws-event-stream-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned config."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pkg_parent = _export_package_path()
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    builder = builder.config("spark.executorEnv.PYTHONPATH", pkg_parent)
    builder = builder.config("spark.sql.shuffle.partitions", str(max(32, cpus)))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    for key, value in BUILDER_CONF.items():
        builder = builder.config(key, value)
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally created session.

    The driver hands us its own SparkSession; timestamp determinism requires
    UTC regardless of who built the session.
    """
    for key, value in ENGINE_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on a live session (e.g. under ANSI policies) —
            # ignore; only the runtime-settable ones matter here.
            pass
    return spark
