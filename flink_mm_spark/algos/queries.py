"""Registry queries exercising the iterative algorithms against testdata.

SQL-checkable pieces (one Lloyd assignment step, the centroid-update
aggregation, MDS stress for a fixed layout) get DuckDB oracles; the full
iterative loops (k-means, DA-MDS) are registered rows-only and verified
against numpy oracles in tests/.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mm_spark.algos import damds as damds_mod
from flink_mm_spark.algos.kmeans import kmeans
from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table

K = 8

# Shared CTE: embeddings as float64 points, first K vectors as centroids,
# squared euclidean distance rounded to 6 decimals for a cross-engine-stable
# argmin (both engines compute the same double up to last-ulp; rounding
# removes the wobble before comparison).
_ASSIGN_CTE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {K}),
    scored AS (
      SELECT e.vec_id, c.cid,
             ROUND(list_sum(list_transform(range(1, len(e.emb) + 1),
                    i -> (e.emb[i] - c.cemb[i]) * (e.emb[i] - c.cemb[i]))), 6) AS d2
      FROM e, c
    ),
    assigned AS (
      SELECT vec_id, cid, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM scored
    )
"""


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark mirror of the _ASSIGN_CTE: nearest of the first K embeddings."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    c = (
        e.filter(F.col("vec_id") < K)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with("emb", "cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
        6,
    )
    from pyspark.sql.window import Window

    scored = e.crossJoin(F.broadcast(c)).select("vec_id", "cid", d2.alias("d2"))
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)


@register(
    "kmeans_assign",
    oracle=_ASSIGN_CTE
    + """
    SELECT cid AS cluster_id, COUNT(*) AS n_points
    FROM assigned WHERE rn = 1
    GROUP BY cid ORDER BY cid
    """,
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step (SURVEY F3 argmin-Euclidean) as SQL-checkable
    cluster counts; centroids = first K embedding vectors."""
    return (
        _assigned(spark, sf_dir)
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cluster_id")
    )


@register(
    "kmeans_centroid_update",
    oracle=_ASSIGN_CTE
    + """
    , upd AS (
      SELECT a.cid, i - 1 AS dim, e.emb[i] AS v
      FROM assigned a JOIN e ON a.vec_id = e.vec_id,
           (SELECT unnest(range(1, 5)) AS i) idx
      WHERE a.rn = 1
    )
    SELECT cid AS cluster_id, dim,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_v,
           COUNT(*) AS n
    FROM upd GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def kmeans_centroid_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The centroid-update aggregation (SURVEY A1/A2: per-cluster mean) as a
    relational query over the first 4 dims — decimal-exact means."""
    assigned = _assigned(spark, sf_dir).select("vec_id", "cid")
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    ).filter(F.col("dim") < 4)
    return (
        assigned.join(e, "vec_id")
        .groupBy(F.col("cid").alias("cluster_id"), "dim")
        .agg(
            # rounded: decimal casts of float32-origin doubles can land on
            # half-up-vs-half-even ties at scale 12 (seen at sf0.1)
            F.round(
                F.sum(F.col("v").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_v"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("cluster_id", "dim")
    )


@register("kmeans_full", oracle=None)  # iterative → rows-only check
def kmeans_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed k-means, 5 Lloyd passes, k=8, init = first 8 vectors
    (SURVEY I1/I4/A2/F3). Returns final centroids as (cluster_id, dim, value)
    rows; verified against a numpy oracle in tests/test_kmeans.py."""
    e = table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("features"), "vec_id"
    )
    init = np.array(
        [r["features"] for r in e.filter(F.col("vec_id") < K).orderBy("vec_id").collect()]
    )
    final = kmeans(e, init, n_iters=5)
    rows = [
        (int(c), int(d), float(np.round(final[c, d], 6)))
        for c in range(final.shape[0])
        for d in range(final.shape[1])
    ]
    return spark.createDataFrame(rows, "cluster_id int, dim int, value double")


@register(
    "mds_stress",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < 100
    ),
    terms AS (
      SELECT a.vec_id AS i, b.vec_id AS j, idx.k,
             CAST((a.emb[idx.k] - b.emb[idx.k]) * (a.emb[idx.k] - b.emb[idx.k])
                  AS DECIMAL(28,12)) AS t
      FROM e a JOIN e b ON a.vec_id < b.vec_id,
           (SELECT unnest(range(1, 65)) AS k) idx
    ),
    pairs AS (
      SELECT i, j,
             CAST(SUM(t) AS DOUBLE) AS dsq_hi,
             CAST(SUM(CASE WHEN k <= 3 THEN t END) AS DOUBLE) AS dsq_lo
      FROM terms GROUP BY i, j
    )
    SELECT CAST(SUM(CAST((dsq_hi - dsq_lo) * (dsq_hi - dsq_lo) AS DECIMAL(30,8))) AS DOUBLE)
             / CAST(SUM(CAST(dsq_hi * dsq_hi AS DECIMAL(30,8))) AS DOUBLE) AS stress
    FROM pairs
    """,
)
def mds_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared-distance MDS stress (SSTRESS) for a fixed layout, relationally.

    Target dissimilarities δ² = squared 64-d euclidean distance; candidate
    layout = first 3 coordinates. σ = Σ(δ²−d²)²/Σ(δ²)² with unit weights —
    the blockwise stress pass of damds/Stress.java:45-93 expressed as a
    pair self-join. Every sum (the per-dimension distance contraction AND
    the pair aggregation) runs through exact decimals, so the result is
    bit-identical to the oracle at any parallelism — sqrt-based stress is
    not exactly aggregatable, which is why the SQL-checked variant uses the
    squared form (the √ kernel is verified against numpy in tests).
    """
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100).select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("k0", "v")
    )
    a = e.select(F.col("vec_id").alias("i"), F.col("k0").alias("ka"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("k0").alias("kb"), F.col("v").alias("vb"))
    term = ((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))).cast("decimal(28,12)")
    pairs = (
        a.join(b, (F.col("ka") == F.col("kb")) & (F.col("i") < F.col("j")))
        .select("i", "j", F.col("ka").alias("k"), term.alias("t"))
        .groupBy("i", "j")
        .agg(
            F.sum("t").cast("double").alias("dsq_hi"),
            F.sum(F.when(F.col("k") <= 2, F.col("t"))).cast("double").alias("dsq_lo"),
        )
    )
    num = F.sum(((F.col("dsq_hi") - F.col("dsq_lo")) * (F.col("dsq_hi") - F.col("dsq_lo"))).cast("decimal(30,8)")).cast("double")
    den = F.sum((F.col("dsq_hi") * F.col("dsq_hi")).cast("decimal(30,8)")).cast("double")
    return pairs.agg((num / den).alias("stress"))


@register("damds_embed", oracle=None)  # iterative linear algebra → rows-only
def damds_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full DA-MDS anneal embedding the first 120 embedding vectors into 3-D
    (SURVEY §3.1 lifecycle: stats → temperature schedule → per-temp SMACOF
    with CG inner solves). Deterministic (seeded init, fixed iteration caps);
    kernels verified against numpy oracles in tests/test_damds.py. The N×N
    distance matrix is built DISTRIBUTED from the points DataFrame
    (``damds_blocks_from_points`` — pairwise GEMM cells, distributed
    quantization scale); the driver only ever holds the (N, 3) embedding."""
    n = 120
    pts_df = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select(
            F.col("vec_id").alias("point_id"),
            F.col("embedding").cast("array<double>").alias("vec"),
        )
    )
    blocks = damds_mod.damds_blocks_from_points(spark, pts_df, n_points=n, n_blocks=8)
    try:
        res = damds_mod.damds(
            blocks, n_points=n, max_temp_loops=2, max_stress_loops=4, cg_iters=8
        )
    finally:
        blocks.unpersist()
    out = [
        (int(i), float(np.round(res.points[i, 0], 5)), float(np.round(res.points[i, 1], 5)),
         float(np.round(res.points[i, 2], 5)))
        for i in range(n)
    ]
    return spark.createDataFrame(out, "point_id int, x double, y double, z double")


# --- S7/S8: lazy side-file row-block source, driver-graded ----------------

_SF_N = 256  # points → 256×256 int16 dist + weight side files
_SF_BLOCKS = 16  # 16 rows per block; block_id = k // (16·256)


def _ensure_sidefile_fixture() -> tuple[str, str]:
    """Deterministic dist+weight int16 side files (big-endian, headerless):
    dist(k) = (k·37 mod 40000) − 7233, weight(k) = (k·13 mod 30000) − 9000
    (negatives = missing pairs, damds/Statistics.java:39-42 convention)."""
    import os

    from flink_mm_spark.sources.binary_matrix import FIXTURE_DIR, write_matrix_file

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    k = np.arange(_SF_N * _SF_N, dtype=np.int64)
    out = []
    for tag, vals in [
        ("dist", (k * 37 % 40000) - 7233),
        ("weight", (k * 13 % 30000) - 9000),
    ]:
        path = f"{FIXTURE_DIR}/damds_{tag}_{_SF_N}.i16.big.bin"
        if not os.path.exists(path):
            write_matrix_file(path + ".tmp", vals.reshape(_SF_N, _SF_N), "int16", "big")
            os.replace(path + ".tmp", path)
        out.append(path)
    return out[0], out[1]


@register(
    "damds_sidefile_scan",
    oracle=f"""
    WITH cells AS (
      SELECT k, (k * 37) % 40000 - 7233 AS s, (k * 13) % 30000 - 9000 AS w
      FROM (SELECT unnest(range(0, {_SF_N * _SF_N})) AS k)
    )
    SELECT CAST(k // {(_SF_N // _SF_BLOCKS) * _SF_N} AS BIGINT) AS block_id,
           CAST(SUM(CASE WHEN s >= 0 THEN s ELSE 0 END) AS BIGINT) AS dist_sum_q,
           CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dist_missing,
           CAST(SUM(CASE WHEN w >= 0 THEN w ELSE 0 END) AS BIGINT) AS weight_sum_q,
           CAST(SUM(CASE WHEN w < 0 THEN 1 ELSE 0 END) AS BIGINT) AS weight_missing
    FROM cells GROUP BY 1 ORDER BY block_id
    """,
)
def damds_sidefile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy row-block side-file pairing (S7/S8: damds/Distances.java:71-106,
    io/RowBlock.java:81-105) → per-block integer rollup.

    Each task offset-reads ONLY its row range from the distance file and the
    matching range of the weight side file (`damds_blocks_from_files`) — the
    shuffle-free dist/weight pairing. The rollup sums raw valid shorts and
    counts negatives (missing) per block, so the oracle reconstructs it from
    range() arithmetic: a wrong offset, byte order, or block boundary — or a
    mispaired weight range — changes the result.
    """
    import pandas as pd

    dist_path, weight_path = _ensure_sidefile_fixture()
    blocks = damds_mod.damds_blocks_from_files(
        spark, dist_path, _SF_N, weight_path=weight_path, n_blocks=_SF_BLOCKS
    )

    def rollup(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = np.asarray(row.dist, dtype=np.int64)
                w = np.asarray(row.weight, dtype=np.int64)
                yield pd.DataFrame(
                    {
                        "block_id": [int(row.block_id)],
                        "dist_sum_q": [int(d[d >= 0].sum())],
                        "dist_missing": [int((d < 0).sum())],
                        "weight_sum_q": [int(w[w >= 0].sum())],
                        "weight_missing": [int((w < 0).sum())],
                    }
                )

    out = blocks.mapInPandas(
        rollup,
        "block_id long, dist_sum_q long, dist_missing long, "
        "weight_sum_q long, weight_missing long",
    ).orderBy("block_id")
    # materialize before unpersisting the source blocks is unnecessary: the
    # rollup is narrow over the persisted scan and re-runnable from files
    blocks.unpersist()
    return out
