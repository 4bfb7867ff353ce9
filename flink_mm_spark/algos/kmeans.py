"""K-means (Lloyd's) as a driver-coordinated Spark loop.

Reference: kmeans/KMeansBlock.java (the benchmarked variant) — per pass the
current centroids are broadcast, each block flatMaps per-centroid partial
(sum, count) pairs, an explicit combineGroup pre-aggregates, and a final
reduceGroup divides (SURVEY I1/A2/F3). Empty clusters are re-emitted as
zero centroids (kmeans/KMeansOriginal.java:119-142, I4).

Spark shape: centroids live on the driver as a (k, d) ndarray broadcast
each pass; assignment + per-partition partial sums happen in one Arrow
batch kernel (mapInPandas — the analogue of the reference's block-local
accumulation at kmeans/KMeansBlock.java:163-202); the only shuffle per pass
is k×d tiny partial rows into a hash aggregate. Input is persisted once, so
each of the 100 passes re-reads cached blocks — the loop-invariant caching
the reference lacks across jobs (SURVEY §4.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PARTIAL_SCHEMA = "cluster int, dim int, s double, cnt bigint"


def assign_clusters(points: DataFrame, centroids: np.ndarray, features_col: str = "features") -> DataFrame:
    """Nearest-centroid id per point (SURVEY F3 argmin-Euclidean)."""
    c = np.asarray(centroids, dtype=np.float64)
    bc = points.sparkSession.sparkContext.broadcast(c)

    @F.pandas_udf("int")
    def assign_udf(feats: pd.Series) -> pd.Series:
        cents = bc.value
        m = np.vstack(feats.to_numpy())
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over centroids
        d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ cents.T) + (cents * cents).sum(1)[None, :]
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return points.withColumn("cluster", assign_udf(features_col))


def lloyd_step(points: DataFrame, centroids: np.ndarray, features_col: str = "features") -> np.ndarray:
    """One Lloyd pass: returns the new (k, d) centroid array."""
    k, d = centroids.shape
    bc = points.sparkSession.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        sums = np.zeros((k, d))
        cnts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            m = np.vstack(pdf[features_col].to_numpy())
            d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ cents.T) + (cents * cents).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            np.add.at(sums, a, m)
            cnts += np.bincount(a, minlength=k)
        live = np.nonzero(cnts)[0]
        n = len(live)
        yield pd.DataFrame(
            {
                "cluster": np.repeat(live, d).astype(np.int32),
                "dim": np.tile(np.arange(d, dtype=np.int32), n),
                "s": sums[live].ravel(),
                "cnt": np.repeat(cnts[live], d),
            }
        )

    agg = (
        points.select(features_col)
        .mapInPandas(partials, PARTIAL_SCHEMA)
        .groupBy("cluster", "dim")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()
    )
    new = np.zeros((k, d))  # vanished clusters stay zero (reference I4)
    counts = np.zeros(k, dtype=np.int64)
    for r in agg:
        new[r["cluster"], r["dim"]] = r["s"]
        counts[r["cluster"]] = r["cnt"]
    nz = counts > 0
    new[nz] /= counts[nz, None]
    return new


def kmeans(
    points: DataFrame,
    init_centroids: np.ndarray,
    n_iters: int = 10,
    features_col: str = "features",
) -> np.ndarray:
    """Full k-means loop; returns final centroids as a (k, d) ndarray."""
    pts = points.select(features_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        centroids = np.asarray(init_centroids, dtype=np.float64).copy()
        for _ in range(n_iters):
            centroids = lloyd_step(pts, centroids, features_col)
        return centroids
    finally:
        pts.unpersist()


def kmeans_numpy_oracle(data: np.ndarray, init: np.ndarray, n_iters: int) -> np.ndarray:
    """Driver-side oracle implementing identical semantics (tests only)."""
    cents = np.asarray(init, dtype=np.float64).copy()
    k = cents.shape[0]
    for _ in range(n_iters):
        d2 = (data * data).sum(1)[:, None] - 2.0 * (data @ cents.T) + (cents * cents).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        new = np.zeros_like(cents)
        for c in range(k):
            mask = a == c
            if mask.any():
                new[c] = data[mask].mean(axis=0)
        cents = new
    return cents
