"""Block-partitioned dense matrices as DataFrames.

The reference's MatrixBlock model (mm/MatrixBlock.java:8-19: a horizontal
row-range of a global matrix with block index, start row, shape metadata and
a row-major flat array) maps to one DataFrame row per block:

    blocks(block_id INT, start BIGINT, block_rows INT,
           matrix_rows BIGINT, matrix_cols INT, data ARRAY<DOUBLE>)

Kernels operate per-block inside Arrow-batched pandas UDFs (each batch
reshapes the flat array to (block_rows, matrix_cols) — zero-copy on the
numpy side). A *cell view* (row_id, col_id, value) derived via posexplode
serves relational checks and SQL interop.

Row-aligned splitting (the reference's createInputSplits,
mm/MatrixInputFormat.java:32-57: q = rows/splits with the remainder spread
one row each to the first r blocks) is reproduced in ``split_rows``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("block_rows", T.IntegerType(), False),
        T.StructField("matrix_rows", T.LongType(), False),
        T.StructField("matrix_cols", T.IntegerType(), False),
        # containsNull: missing cells (negative quantized shorts) are NULL,
        # the §1.3 mapping; Arrow also folds NaN→null on the pandas boundary.
        T.StructField("data", T.ArrayType(T.DoubleType(), True), False),
    ]
)


def split_rows(n_rows: int, n_blocks: int) -> list[tuple[int, int, int]]:
    """Row-aligned block ranges: [(block_id, start, block_rows)].

    q = n_rows // n_blocks rows per block, remainder spread one row each to
    the first (n_rows % n_blocks) blocks — same partitioning the reference
    computes in mm/MatrixInputFormat.java:32-57.
    """
    q, r = divmod(n_rows, n_blocks)
    out = []
    start = 0
    for b in range(n_blocks):
        rows = q + (1 if b < r else 0)
        if rows == 0:
            continue
        out.append((b, start, rows))
        start += rows
    return out


def blocks_from_numpy(spark: SparkSession, arr: np.ndarray, n_blocks: int) -> DataFrame:
    """Partition a driver-side (rows, cols) array into a block DataFrame.

    Ships via a pandas DataFrame so createDataFrame takes the Arrow path
    (one columnar batch) instead of per-row py4j pickling.
    """
    import pandas as pd

    arr = np.asarray(arr, dtype=np.float64)
    n_rows, n_cols = arr.shape
    specs = split_rows(n_rows, n_blocks)
    pdf = pd.DataFrame(
        {
            "block_id": np.array([b for b, _, _ in specs], dtype=np.int32),
            "start": np.array([s for _, s, _ in specs], dtype=np.int64),
            "block_rows": np.array([r for _, _, r in specs], dtype=np.int32),
            "matrix_rows": np.full(len(specs), n_rows, dtype=np.int64),
            "matrix_cols": np.full(len(specs), n_cols, dtype=np.int32),
            "data": [arr[s : s + r].ravel() for _, s, r in specs],
        }
    )
    return spark.createDataFrame(pdf, BLOCK_SCHEMA).repartition(min(n_blocks, 64), "block_id")


def blocks_to_numpy(blocks: DataFrame) -> np.ndarray:
    """Ordered gather: assemble the global matrix on the driver (SURVEY A6).

    The reference sorts collected blocks by index and arraycopies into one
    array at parallelism 1 (damds/CG.java:300-331); here it is an ordered
    collect + vstack. Only valid when the global matrix fits the driver —
    true for every gather site the reference has (C results, N×3 points).
    """
    rows = blocks.select("block_id", "block_rows", "matrix_cols", "data").orderBy("block_id").collect()
    if not rows:
        return np.zeros((0, 0))
    parts = [
        np.asarray(r["data"], dtype=np.float64).reshape(r["block_rows"], r["matrix_cols"])
        for r in rows
    ]
    return np.vstack(parts)


def blocks_to_cells(blocks: DataFrame) -> DataFrame:
    """Cell view (row_id, col_id, value) — relational interop for checks."""
    b = blocks.select(
        "start", "matrix_cols", F.posexplode("data").alias("pos", "value")
    )
    return b.select(
        (F.col("start") + (F.col("pos") / F.col("matrix_cols")).cast("long")).alias("row_id"),
        (F.col("pos") % F.col("matrix_cols")).cast("long").alias("col_id"),
        F.col("value"),
    )
