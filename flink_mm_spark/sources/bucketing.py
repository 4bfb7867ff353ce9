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
