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
    """Persist a table bucketed (and sorted) by the join key.

    mode("overwrite") only replaces tables the CURRENT catalog knows about;
    a fresh session whose warehouse dir still holds a previous session's
    table location fails with LOCATION_ALREADY_EXISTS. Drop both the
    catalog entry and any stale location first so the write is idempotent
    across sessions.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{loc.path}/{name.lower()}", ignore_errors=True)
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

import os  # noqa: E402

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

# --- Bucketed fact⋈fact join, graded end-to-end ----------------------------


@register(
    "bucketed_fact_join",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two TPC-H fact tables written BUCKETED on the order key, then
    joined from the at-rest layout — the storage-level analogue of the
    reference's shuffle-avoiding side-file re-read (J3,
    damds/Distances.java:71-106) applied to relational facts.

    End-to-end graded: orders and lineitem are each written with
    ``write_bucketed`` (8 buckets, sorted, same key), read back via the
    catalog, equi-joined, and rolled up per order priority with
    decimal-exact quantity sums; the oracle computes the same rollup from
    the SOURCE parquet, so a row lost/duplicated in the bucketed write or
    a key mis-hashed into the wrong bucket changes the result.

    Scale note: with both sides pre-bucketed the equi-join needs no
    Exchange (pinned by tests/test_bucketing.py with broadcast disabled —
    under the default session the small sf side may broadcast instead,
    which is also shuffle-free); at 100 TB the bucketed layout converts
    every recurring orders⋈lineitem join from a full network shuffle into
    a per-bucket local merge, amortized across all queries that reuse it.
    The post-join groupBy reduces to ~5 priority rows via partial
    aggregation, so the only wide stage is that final tiny merge.
    """
    from flink_mm_spark.operators.relational import dsum
    from flink_mm_spark.sources.tables import table

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    bo, bl = f"b_orders_{tag}", f"b_lineitem_{tag}"
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, bo, "o_orderkey", n_buckets=8)
    write_bucketed(li, bl, "l_orderkey", n_buckets=8)
    j = colocated_join(spark, bo, bl, "o_orderkey", "l_orderkey")
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy("priority")
    )
