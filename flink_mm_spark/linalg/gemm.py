"""Distributed GEMM: C = A × B with A row-block-partitioned, B broadcast.

Reference semantics (mm/MatrixMultiply.java:107-160 + mm/Utils.java:16-35):
each worker multiplies its row block of A by the full (broadcast) B and the
results are gathered ordered by block index. Here: B ships as a Spark
broadcast ndarray, the per-block product is one numpy ``@`` inside an
Arrow-batched pandas UDF, and C stays distributed as a block DataFrame
(gather to the driver only if the caller asks).

Scale: A can be arbitrarily large (blocks are rows of a DataFrame spread
over executors); the only constraint is B fits in executor memory — the
same constraint the reference has. For B too large to broadcast the cell
view + shuffle join path in ``linalg.queries.matmul_cells`` applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def gemm_broadcast(blocks: DataFrame, b_matrix: np.ndarray) -> DataFrame:
    """Multiply a block-partitioned A by a small dense B (driver ndarray)."""
    b_matrix = np.asarray(b_matrix, dtype=np.float64)
    n_out_cols = int(b_matrix.shape[1])
    spark = blocks.sparkSession
    b_bc = spark.sparkContext.broadcast(b_matrix)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def gemm_udf(data: pd.Series, block_rows: pd.Series, matrix_cols: pd.Series) -> pd.Series:
        b_local = b_bc.value
        out = []
        for flat, nrows, ncols in zip(data, block_rows, matrix_cols):
            a = np.asarray(flat, dtype=np.float64).reshape(int(nrows), int(ncols))
            out.append((a @ b_local).ravel())
        return pd.Series(out)

    return blocks.select(
        "block_id",
        "start",
        "block_rows",
        "matrix_rows",
        F.lit(n_out_cols).cast("int").alias("matrix_cols"),
        gemm_udf("data", "block_rows", "matrix_cols").alias("data"),
    )
