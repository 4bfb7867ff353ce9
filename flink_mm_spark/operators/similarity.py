"""Embedding similarity search over ARRAY<FLOAT> columns.

Baseline: brute-force cosine top-k with JVM-side higher-order functions
(zip_with/aggregate — stays in whole-stage codegen, no Python in the hot
path). Scale path: random-hyperplane LSH bucketing so the candidate join is
keyed on a short signature instead of crossing every pair.

All float math is done in float64 (embeddings cast up front) so Spark and
the DuckDB oracle agree; cosine values are rounded to 6 decimals before
compare/thresholding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table

EMB_DIM = 64


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i b_i as a JVM fold (SURVEY F5; damds/DAMDSUtils.java:54-62)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def embeddings64(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")


@register(
    "cosine_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    q AS (SELECT emb AS qv FROM e WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(
             list_sum(list_transform(range(1, len(e.emb) + 1), i -> e.emb[i] * q.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(e.emb) + 1), i -> e.emb[i] * e.emb[i])))
                * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * q.qv[i])))),
             6) AS cos_sim
    FROM e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vector vec_id=0.

    The query vector is a 1-row broadcast cross join; scoring is a codegen'd
    fold over the array; top-k is TakeOrderedAndProject (no global sort).
    """
    e = embeddings64(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("emb"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "knn_per_label",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < 100
    ),
    scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(
               list_sum(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * b.emb[i]))
               / (sqrt(list_sum(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i])))
                  * sqrt(list_sum(list_transform(range(1, len(b.emb) + 1), i -> b.emb[i] * b.emb[i])))),
               6) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT vec_a, vec_b, cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b
             ) AS INTEGER) AS rnk
      FROM scored
    )
    SELECT vec_a, vec_b, cos_sim, rnk FROM ranked WHERE rnk <= 3
    ORDER BY vec_a, rnk
    """,
)
def knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest neighbors per vector *within its label partition*.

    The label acts as a blocking key (the IVF idea: search only your cell) —
    the join is label-partitioned, so at scale each shuffle bucket holds one
    label's vectors, never the full corpus.
    """
    from pyspark.sql.window import Window

    e = embeddings64(spark, sf_dir).filter(F.col("vec_id") < 100)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("emb").alias("eb"))
    scored = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") != F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_expr(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), F.col("vec_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .orderBy("vec_a", "rnk")
    )


# ---------------------------------------------------------------------------
# ANN: random-hyperplane LSH (scale path)
# ---------------------------------------------------------------------------

N_PLANES = 8  # 2^8 buckets; multi-probe widens the search (see ann_lsh_topk)
_PLANES = np.random.RandomState(7).standard_normal((N_PLANES, EMB_DIM))


def lsh_bucketed(spark: SparkSession, sf_dir: str, n_planes: int = N_PLANES) -> DataFrame:
    """vec_id → LSH bucket (sign pattern against fixed random hyperplanes)."""
    e = embeddings64(spark, sf_dir)
    planes = _PLANES[:n_planes]

    @F.pandas_udf(T.LongType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy())  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return e.select("vec_id", "emb", "label", bucket_udf("emb").alias("bucket"))


@register("ann_lsh_topk", oracle=None)  # approximate → rows-only check
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors per vector via multi-probe hyperplane LSH.

    Vectors hash to an 8-bit sign bucket; each query vector probes its own
    bucket plus every distance-1 bucket (one sign bit flipped — the planes
    a near-neighbor most plausibly straddles), so the candidate join stays
    an equi-join on bucket id with a 9× probe fan-out instead of a wider
    (unscalable) similarity predicate. Recall vs brute force is asserted in
    tests/test_similarity.py. At 100 TB: bucket id is the shuffle key;
    probe fan-out and plane count trade recall for join size.
    """
    from pyspark.sql.window import Window

    bucketed = lsh_bucketed(spark, sf_dir)
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PLANES)],
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("ea"),
        F.explode(probes).alias("probe"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"), F.col("bucket").alias("bb")
    )
    scored = (
        a.join(b, (F.col("probe") == F.col("bb")) & (F.col("vec_a") != F.col("vec_b")))
        .select("vec_a", "vec_b", F.round(cosine_expr(F.col("ea"), F.col("eb")), 6).alias("cos_sim"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    w = Window.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), F.col("vec_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .orderBy("vec_a", "rnk")
    )
