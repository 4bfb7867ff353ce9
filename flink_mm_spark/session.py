"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the driver harness (local[32], 128 GiB) but expressed so
the same code runs unchanged on a multi-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast) — the knob that makes one logical plan survive a
  100x scale-up.
- Arrow on for all pandas-UDF exchange (the linalg kernels are
  Arrow-batched; row-at-a-time Python UDFs are never used).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_TMP_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Per-invocation temp dir under ONE process-lifetime root that is
    removed at interpreter exit (ADVICE r4: per-invocation ``mkdtemp``
    sink destinations / stream checkpoints accumulated in /tmp across
    repeated bench/driver/pytest runs — lazy plans re-read the dir at
    collect time, so in-builder cleanup is impossible; process-exit
    cleanup is the correct lifetime)."""
    global _TMP_ROOT
    if _TMP_ROOT is None:
        _TMP_ROOT = tempfile.mkdtemp(prefix="flink_mm_spark_scratch_")
        atexit.register(shutil.rmtree, _TMP_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_TMP_ROOT)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flink-mm-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults applied."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The driver harness passes us its own SparkSession; only runtime-mutable
    confs may be set here (anything requiring JVM restart is left alone).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # skew-join splitting must ride along wherever AQE does: the naive
    # Jaccard posting self-join (and any hot-key equi-join) relies on it
    # at scale (scripts/skew_experiment.py measures the effect)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # the binmatrix connector implements pushFilters; Spark refuses to plan
    # a pushdown-capable Python data source while this is false
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark
