"""Registry queries exercising the linalg surface against testdata.

The embeddings table doubles as a dense matrix source: rows (vec_id < n)
form an (n, 64) float64 matrix. Two matmul paths are exposed:

- ``matmul_cells``: pure-relational matmul over the cell view — explode,
  shuffle-join on the contraction index, decimal-exact sum. This is the
  "B too big to broadcast" path and is exactly SQL-checkable.
- ``gemm_broadcast_cells``: the real kernel path (block DataFrame +
  broadcast B + numpy GEMM in a pandas UDF), checked against the same SQL
  with 6-decimal rounding (BLAS pairwise summation vs SQL sequential sum
  differ in the last ulp).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mm_spark.linalg.block_matrix import blocks_from_numpy, blocks_to_cells
from flink_mm_spark.linalg.gemm import gemm_broadcast
from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table


def _emb_matrix(spark: SparkSession, sf_dir: str, n: int) -> np.ndarray:
    rows = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["e"] for r in rows], dtype=np.float64)


def _emb_matrices(spark: SparkSession, sf_dir: str, n_a: int, n_b: int) -> tuple[np.ndarray, np.ndarray]:
    """Both operand matrices from ONE scan+collect (one Spark job, not two)."""
    m = _emb_matrix(spark, sf_dir, max(n_a, n_b))
    return m[:n_a], m[:n_b]


@register(
    "matmul_cells",
    oracle="""
    WITH idx AS (SELECT unnest(range(1, 65)) AS i),
    a AS (
      SELECT vec_id AS row_id, i - 1 AS k, emb[i] AS v
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id < 60), idx
    )
    SELECT a.row_id, b.row_id AS col_id,
           CAST(SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS DOUBLE) AS value
    FROM a JOIN a b ON a.k = b.k
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def matmul_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational matmul C = A·Aᵀ via cell-view shuffle join (SURVEY F1/J1).

    Contraction index k is the join key; the product is summed as decimal so
    the result is bit-stable at any parallelism. This path scales to both
    operands distributed (no broadcast requirement).
    """
    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 60)
        .select("vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("k", "v"))
    )
    a = e.select(F.col("vec_id").alias("row_id"), F.col("k"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("col_id"), F.col("k"), F.col("v").alias("vb"))
    return (
        a.join(b, "k")
        .groupBy("row_id", "col_id")
        .agg(F.sum((F.col("va") * F.col("vb")).cast("decimal(28,12)")).cast("double").alias("value"))
        .orderBy("row_id", "col_id")
    )


@register(
    "gemm_broadcast_cells",
    oracle="""
    WITH idx AS (SELECT unnest(range(1, 65)) AS i),
    a AS (
      SELECT vec_id AS row_id, i - 1 AS k, emb[i] AS v
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id < 60), idx
    ),
    b AS (
      SELECT vec_id AS col_id, i - 1 AS k, emb[i] AS v
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings WHERE vec_id < 8), idx
    )
    SELECT a.row_id, b.col_id,
           ROUND(CAST(SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS DOUBLE), 6) AS value
    FROM a JOIN b ON a.k = b.k
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def gemm_broadcast_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block GEMM with broadcast B (the MatrixMultiply workload, SURVEY F1/J2).

    A = embeddings[:60] row-block-partitioned; B = embeddings[:8]ᵀ broadcast;
    per-block numpy GEMM in a pandas UDF; result exposed as rounded cells.
    """
    a, b = _emb_matrices(spark, sf_dir, 60, 8)
    b = b.T  # (64, 8)
    blocks = blocks_from_numpy(spark, a, n_blocks=8)
    c = gemm_broadcast(blocks, b)
    return (
        blocks_to_cells(c)
        .select("row_id", "col_id", F.round(F.col("value"), 6).alias("value"))
        .orderBy("row_id", "col_id")
    )


@register(
    "short_matrix_stats",
    oracle="""
    WITH q AS (
      SELECT CASE WHEN l_quantity < 2 THEN CAST(-1 AS SMALLINT)
                  ELSE CAST(FLOOR(l_discount * 32767) AS SMALLINT) END AS qv
      FROM lineitem
    ),
    d AS (SELECT CAST(qv * (1.0/32767.0) AS DOUBLE) AS v FROM q WHERE qv >= 0)
    SELECT COUNT(*) AS cnt,
           CAST(MIN(v) AS DOUBLE) AS min_v,
           CAST(MAX(v) AS DOUBLE) AS max_v,
           CAST(MIN(CASE WHEN v > 0 THEN v END) AS DOUBLE) AS positive_min,
           CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE) AS sum_v,
           CAST(SUM(CAST(v * v AS DECIMAL(24,12))) AS DOUBLE) AS sum_sq
    FROM d
    """,
)
def short_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoubleStatistics over a quantized short matrix with missing cells.

    Recreates the reference's stats pass (damds/Statistics.java:11-47 +
    quantization F12): negative shorts are missing and skipped; stats are
    computed on dequantized values. The "matrix" is derived from lineitem
    so the oracle sees identical input.
    """
    li = table(spark, sf_dir, "lineitem")
    qv = F.when(F.col("l_quantity") < 2, F.lit(-1).cast("smallint")).otherwise(
        F.floor(F.col("l_discount") * 32767).cast("smallint")
    )
    d = (
        li.select(qv.alias("qv"))
        .filter(F.col("qv") >= 0)
        .select((F.col("qv") * (1.0 / 32767.0)).cast("double").alias("v"))
    )
    v = F.col("v")
    return d.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(v).cast("double").alias("min_v"),
        F.max(v).cast("double").alias("max_v"),
        F.min(F.when(v > 0, v)).cast("double").alias("positive_min"),
        F.sum(v.cast("decimal(18,8)")).cast("double").alias("sum_v"),
        F.sum((v * v).cast("decimal(24,12)")).cast("double").alias("sum_sq"),
    )
