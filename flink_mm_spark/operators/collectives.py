"""Collective communication patterns as DataFrame plans (SURVEY A7).

The reference ships Reduce and AllReduce micro-benchmarks
(collectives/Reduce.java:47-66, collectives/AllReduce.java:43-79: every
parallel instance contributes a size-1000 vector of ones; Reduce combines
them; AllReduce redistributes the combined vector to every instance). On
Spark these are not custom operators at all:

- Reduce   = map-side partials + a hash-shuffle combine (posexplode +
  groupBy(pos) — Catalyst plans partial/final HashAggregate, i.e. the
  combine tree the reference hand-codes).
- AllReduce = Reduce followed by a broadcast join back to every partition
  (BroadcastExchange IS the all-to-all redistribution).

``bench.py`` times the latency variants; these registered queries pin the
*semantics* with exact oracles — ones-vectors make the combined values
analytically known (total per element = N_PART; per-partition checksum =
VEC_SIZE · N_PART).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mm_spark.registry import register

VEC_SIZE = 1000  # Program.java:13-26 (size=1000, itr defaults elsewhere)
N_PART = 32


def _partial_vectors(spark: SparkSession) -> DataFrame:
    """One ones-vector per parallel instance (the reference's data source)."""

    def partials(batches):
        for pdf in batches:
            yield pd.DataFrame({"part_id": pdf["id"], "v": [np.ones(VEC_SIZE).tolist()] * len(pdf)})

    return spark.range(0, N_PART, 1, N_PART).mapInPandas(partials, "part_id long, v array<double>")


def reduced_vector(spark: SparkSession) -> DataFrame:
    """(pos, total): element-wise sum across all partial vectors."""
    return (
        _partial_vectors(spark)
        .select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.sum("x"), 6).alias("total"))
        .select(F.col("pos").cast("int").alias("pos"), "total")
    )


@register(
    "collectives_reduce",
    oracle=f"""
    SELECT CAST(i - 1 AS INT) AS pos, CAST({N_PART} AS DOUBLE) AS total
    FROM (SELECT unnest(range(1, {VEC_SIZE} + 1)) AS i)
    ORDER BY pos
    """,
)
def collectives_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector Reduce: partial per-instance vectors combined element-wise
    (collectives/Reduce.java:47-66). Partial aggregation is Catalyst's:
    map-side HashAggregate sums each instance's contribution before the
    one shuffle on `pos`."""
    return reduced_vector(spark).orderBy("pos")


@register(
    "collectives_allreduce",
    oracle=f"""
    SELECT CAST(i - 1 AS BIGINT) AS part_id,
           CAST({VEC_SIZE} * {N_PART} AS DOUBLE) AS checksum
    FROM (SELECT unnest(range(1, {N_PART} + 1)) AS i)
    ORDER BY part_id
    """,
)
def collectives_allreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector AllReduce: the reduced vector redistributes to every parallel
    instance, which proves receipt via its checksum
    (collectives/AllReduce.java:43-79). The redistribution is a broadcast
    join — BroadcastExchange ships the combined vector to all partitions."""
    reduced = reduced_vector(spark)
    parts = spark.range(0, N_PART, 1, N_PART).select(F.col("id").alias("part_id"))
    return (
        parts.join(F.broadcast(reduced))
        .groupBy("part_id")
        .agg(F.round(F.sum("total"), 6).alias("checksum"))
        .orderBy("part_id")
    )
