"""Whitespace-delimited text point files (reference S4–S6 semantics).

The reference parses text files of whitespace-separated doubles three ways:
a whole-file single-matrix reader (mm/PointInputFormat.java:44-72), a
splittable per-block reader with a strict arity check
(kmeans/PointInputFormat.java:364-428 — 589 lines of hand-rolled line
framing), and plain readTextFile + map parsing
(kmeans/KMeansOriginal.java:83-105,168-172).

Spark replaces all of it with ``spark.read.text`` (distributed, splittable
line framing for free) + one JVM-side split/cast projection — no Python in
the parse path, and Catalyst prunes/pushes into the scan. The strict arity
check (throw when a line has the wrong column count) is preserved via
``ANSI`` cast null-check + an optional raise.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mm_spark.registry import register


def read_points_text(spark: SparkSession, path: str, d: int, strict: bool = True) -> DataFrame:
    """Text lines of d whitespace-separated doubles → points(features ARRAY<DOUBLE>).

    ``strict`` reproduces the reference's arity check
    (kmeans/PointInputFormat.java:408-428: throw if splits.length != d).
    The check runs INSIDE the scan (raise_error on the first malformed
    line, surfacing on the caller's action) — no separate validation job,
    the file is read once. strict=False turns malformed lines into NULL
    feature rows instead.
    """
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    if strict:
        # ANSI cast: a non-numeric token raises; wrong arity raises explicitly
        feats = F.transform(toks, lambda s: s.cast("double"))
        good = F.when(F.size(toks) == d, feats).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"line does not have exactly {d} columns: "), F.col("value")
                )
            ).cast("array<double>")
        )
    else:
        # try_cast: malformed tokens or arity → NULL feature row, never a
        # job abort (Spark 4 runs ANSI mode by default)
        feats = F.transform(toks, lambda s: s.try_cast("double"))
        ok = (F.size(toks) == d) & (
            F.size(F.filter(feats, lambda x: x.isNull())) == 0
        )
        good = F.when(ok, feats)
    return lines.filter(F.length(F.trim("value")) > 0).select(good.alias("features"))


def read_centroids_text(spark: SparkSession, path: str, d: int) -> DataFrame:
    """id + d coords per line → centroids(id INT, features ARRAY<DOUBLE>)
    (kmeans/KMeansOriginal.java:95-105 parse semantics). Lines without
    exactly 1 + d tokens raise (same strictness as read_points_text)."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    feats = F.when(F.size(toks) == d + 1, F.slice(toks, 2, d).cast("array<double>")).otherwise(
        F.raise_error(
            F.concat(F.lit(f"centroid line does not have exactly {d + 1} columns: "), F.col("value"))
        ).cast("array<double>")
    )
    return lines.filter(F.length(F.trim("value")) > 0).select(
        F.element_at(toks, 1).cast("int").alias("id"),
        feats.alias("features"),
    )


# --- formula fixture + oracle (proves the parse path) ----------------------

FIXTURE_DIR = "/tmp/flink_mm_spark_fixtures"
_N, _D = 2000, 4


def ensure_points_fixture() -> str:
    """Deterministic points file: coord(i,j) = ((i·d+j) mod 89) / 8."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = f"{FIXTURE_DIR}/points_{_N}x{_D}.txt"
    if not os.path.exists(path):
        k = np.arange(_N * _D).reshape(_N, _D)
        vals = (k % 89) / 8.0
        with open(path + ".tmp", "w") as f:
            for row in vals:
                f.write(" ".join(repr(v) for v in row) + "\n")
        os.replace(path + ".tmp", path)
    return path


@register(
    "text_points_scan",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN k % {_D} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_points,
           CAST(SUM(k % 89) AS BIGINT) AS sum_q,
           CAST(MAX((k % 89) / 8.0) AS DOUBLE) AS max_v
    FROM (SELECT unnest(range(0, {_N} * {_D})) AS k)
    """,
)
def text_points_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed text-points parse (S4–S6) → global rollup.

    The fixture holds coord = ((i·d+j) mod 89)/8 (exact in float64, ×8
    re-quantizes exactly), so the oracle reconstructs the expected sums
    from range() arithmetic — any mis-parse, dropped line or split-boundary
    bug changes the result.
    """
    path = ensure_points_fixture()
    pts = read_points_text(spark, path, _D)
    cell = pts.select(F.explode("features").alias("v"))
    return cell.agg(
        (F.count(F.lit(1)) / _D).cast("long").alias("n_points"),
        F.sum(F.round(F.col("v") * 8).cast("long")).alias("sum_q"),
        F.max("v").cast("double").alias("max_v"),
    )


_CK, _CD = 300, 4


def ensure_centroids_fixture() -> str:
    """Deterministic centroids file: 'id x0..x3' with x(i,j) = ((i·d+j) mod 97)/8."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = f"{FIXTURE_DIR}/centroids_{_CK}x{_CD}.txt"
    if not os.path.exists(path):
        k = np.arange(_CK * _CD).reshape(_CK, _CD)
        vals = (k % 97) / 8.0
        with open(path + ".tmp", "w") as f:
            for i, row in enumerate(vals):
                f.write(str(i) + " " + " ".join(repr(v) for v in row) + "\n")
        os.replace(path + ".tmp", path)
    return path


@register(
    "centroid_lines_scan",
    oracle=f"""
    SELECT CAST(k // {_CD} AS BIGINT) AS id,
           CAST(SUM(k % 97) AS BIGINT) AS sum_q,
           CAST(COUNT(*) AS BIGINT) AS n_coords
    FROM (SELECT unnest(range(0, {_CK} * {_CD})) AS k)
    GROUP BY 1 ORDER BY id
    """,
)
def centroid_lines_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid text-line scan (S6: kmeans/KMeansOriginal.java:95-105) →
    per-centroid rollup.

    The fixture holds 'id x0..x3' lines with x = ((id·d+j) mod 97)/8
    (exact in float64); the strict-arity JVM parse feeds an explode +
    groupBy(id) whose ×8 re-quantization the oracle reconstructs from
    range() arithmetic — a dropped line, swapped id column, or off-by-one
    in the slice changes the result.
    """
    path = ensure_centroids_fixture()
    cents = read_centroids_text(spark, path, _CD)
    return (
        cents.select(F.col("id").cast("long"), F.explode("features").alias("v"))
        .groupBy("id")
        .agg(
            F.sum(F.round(F.col("v") * 8).cast("long")).alias("sum_q"),
            F.count(F.lit(1)).alias("n_coords"),
        )
        .orderBy("id")
    )
