"""Distributed k-means vs the numpy oracle (identical semantics)."""

from __future__ import annotations

import numpy as np

from flink_mm_spark.algos.kmeans import assign_clusters, kmeans, kmeans_numpy_oracle


def _points_df(spark, data):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(data)], "id long, features array<double>"
    )


def test_kmeans_matches_numpy_oracle(spark):
    rng = np.random.RandomState(5)
    data = np.vstack(
        [rng.standard_normal((80, 4)) + c * 5.0 for c in range(3)]
    )
    init = data[:3].copy()
    got = kmeans(_points_df(spark, data), init, n_iters=6)
    want = kmeans_numpy_oracle(data, init, n_iters=6)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_assign_clusters(spark):
    rng = np.random.RandomState(6)
    data = rng.standard_normal((50, 3))
    cents = data[:4].copy()
    rows = assign_clusters(_points_df(spark, data), cents).orderBy("id").collect()
    d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want = np.argmin(d2, axis=1)
    got = np.array([r["cluster"] for r in rows])
    np.testing.assert_array_equal(got, want)


def test_empty_cluster_stays_zero(spark):
    """Reference I4: a cluster that captures no points re-emits as zeros
    (kmeans/KMeansOriginal.java:119-142)."""
    data = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]])
    init = np.array([[0.5, 0.5], [100.0, 100.0]])  # second centroid captures nothing
    got = kmeans(_points_df(spark, data), init, n_iters=1)
    np.testing.assert_allclose(got[0], data.mean(axis=0))
    np.testing.assert_array_equal(got[1], [0.0, 0.0])


def test_kmeans_from_text_files_end_to_end(spark, tmp_path):
    """The reference's full KMeansBlock program shape (kmeans/KMeansBlock.
    java:16-116): text points file + text centroids file → parse → iterate
    → final centroids, vs the numpy oracle on the same inputs."""
    import numpy as np

    from flink_mm_spark.algos.kmeans import kmeans, kmeans_numpy_oracle
    from flink_mm_spark.sources.text_points import read_centroids_text, read_points_text

    rng = np.random.RandomState(17)
    pts = np.vstack(
        [rng.standard_normal((80, 2)) + c for c in ([0, 0], [8, 8], [-8, 6])]
    )
    init = pts[::60][:4]
    ppath, cpath = tmp_path / "pts.txt", tmp_path / "cents.txt"
    ppath.write_text("\n".join(" ".join(repr(v) for v in r) for r in pts) + "\n")
    cpath.write_text(
        "\n".join(f"{i + 1} " + " ".join(repr(v) for v in r) for i, r in enumerate(init)) + "\n"
    )

    points_df = read_points_text(spark, str(ppath), 2)
    cents = read_centroids_text(spark, str(cpath), 2).orderBy("id").collect()
    init_arr = np.array([r["features"] for r in cents])

    got = kmeans(points_df, init_arr, n_iters=5)
    want = kmeans_numpy_oracle(pts, init_arr, n_iters=5)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kmeans_higher_dims(spark):
    """d=8 (the reference generator supports 2-100d): distributed loop
    matches the numpy oracle."""
    import numpy as np

    from flink_mm_spark.algos.kmeans import kmeans, kmeans_numpy_oracle

    rng = np.random.RandomState(23)
    pts = np.vstack([rng.standard_normal((60, 8)) + c for c in (0.0, 6.0, -6.0)])
    init = pts[::50][:3]
    df = spark.createDataFrame([(row.tolist(),) for row in pts], "features array<double>")
    got = kmeans(df, init, n_iters=4)
    want = kmeans_numpy_oracle(pts, init, n_iters=4)
    np.testing.assert_allclose(got, want, rtol=1e-9)
