"""Bucketed (co-located) table layout: shuffle-free joins at rest.

The reference avoids one shuffle by re-reading a side file per block
(damds/Distances.java:71-106, SURVEY S8/J3). The storage-level Spark
equivalent is bucketing: both tables hash-partitioned into the same number
of buckets on the join key at WRITE time, so every later equi-join on that
key needs no Exchange — at 100 TB this converts the fact⋈fact join from a
full network shuffle into a local merge per bucket, amortized across every
query that reuses the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist a table bucketed (and sorted) by the join key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession, left: str, right: str, key_l: str, key_r: str
) -> DataFrame:
    """Equi-join of two same-bucketed tables — planner drops the Exchange."""
    lt = spark.table(left)
    rt = spark.table(right)
    return lt.join(rt, lt[key_l] == rt[key_r])


# --- S10 sink, driver-graded: partitioned write → read-back rollup --------

from pyspark.sql import functions as F  # noqa: E402

from flink_mm_spark.registry import register  # noqa: E402


@register(
    "partitioned_sink_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File sink graded end-to-end (S10: TextOutputFormat/collect sinks →
    `df.write`): events written Hive-partitioned by event_type, read back,
    rolled up per partition.

    The oracle computes the same rollup from the SOURCE table, so a row
    lost or duplicated anywhere in the write → list → read-back path
    changes the result. Partition pruning on this layout is asserted in
    tests/test_plans.py::test_partitioned_write_prunes_partitions; at
    100 TB this hive-partitioned layout (plus bucketing, `write_bucketed`)
    is the at-rest lever for event tables.
    """
    import os
    import tempfile

    from flink_mm_spark.sources.tables import table

    out = os.path.join(
        tempfile.gettempdir(),
        "flink_mm_spark_sink",
        f"events_by_type_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("sum_uid"),
        )
        .orderBy("event_type")
    )
