"""Block-matrix + GEMM kernels vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from flink_mm_spark.linalg.block_matrix import (
    blocks_from_numpy,
    blocks_to_cells,
    blocks_to_numpy,
    split_rows,
)
from flink_mm_spark.linalg.gemm import gemm_broadcast


def test_split_rows_reference_semantics():
    # q rows per block, remainder spread one-each to the first r blocks
    # (mm/MatrixInputFormat.java:32-57)
    assert split_rows(10, 3) == [(0, 0, 4), (1, 4, 3), (2, 7, 3)]
    assert split_rows(6, 3) == [(0, 0, 2), (1, 2, 2), (2, 4, 2)]
    assert split_rows(2, 4) == [(0, 0, 1), (1, 1, 1)]  # empty blocks dropped
    assert [r for _, s, r in split_rows(1000, 7)] == [143, 143, 143, 143, 143, 143, 142]


def test_blocks_roundtrip(spark):
    rng = np.random.RandomState(0)
    a = rng.standard_normal((37, 5))
    blocks = blocks_from_numpy(spark, a, n_blocks=4)
    back = blocks_to_numpy(blocks)
    np.testing.assert_array_equal(a, back)


def test_blocks_to_cells(spark):
    a = np.arange(12, dtype=np.float64).reshape(4, 3)
    cells = blocks_to_cells(blocks_from_numpy(spark, a, n_blocks=2)).collect()
    got = {(r["row_id"], r["col_id"]): r["value"] for r in cells}
    assert len(got) == 12
    for i in range(4):
        for j in range(3):
            assert got[(i, j)] == a[i, j]


@pytest.mark.parametrize("shape", [(16, 8, 4), (33, 7, 9), (5, 64, 3)])
def test_gemm_broadcast_matches_numpy(spark, shape):
    n, k, m = shape
    rng = np.random.RandomState(1)
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((k, m))
    c = blocks_to_numpy(gemm_broadcast(blocks_from_numpy(spark, a, n_blocks=3), b))
    np.testing.assert_allclose(c, a @ b, rtol=1e-12)


def test_gemm_result_stays_distributed(spark):
    """The product is a block DataFrame (no driver materialization)."""
    a = np.ones((10, 4))
    b = np.ones((4, 2))
    c = gemm_broadcast(blocks_from_numpy(spark, a, n_blocks=2), b)
    assert c.filter("matrix_cols = 2").count() == 2  # still 2 block rows
