"""Binary matrix source: endianness, quantization, split alignment."""

from __future__ import annotations

import numpy as np
import pytest

from flink_mm_spark.linalg.block_matrix import blocks_to_numpy
from flink_mm_spark.sources.binary_matrix import (
    INV_SHORT_MAX,
    generate_short_blocks,
    read_matrix_blocks,
    write_matrix_file,
)


@pytest.mark.parametrize("byteorder", ["big", "little"])
def test_f64_roundtrip(spark, tmp_path, byteorder):
    rng = np.random.RandomState(3)
    arr = rng.standard_normal((37, 11))
    path = str(tmp_path / f"m.{byteorder}.bin")
    write_matrix_file(path, arr, "float64", byteorder)
    blocks = read_matrix_blocks(spark, path, 37, 11, "float64", byteorder, n_blocks=5)
    got = blocks_to_numpy(blocks)
    np.testing.assert_array_equal(got, arr)


def test_i16_dequant_and_missing(spark, tmp_path):
    arr = np.array([[100, -5, 32767], [0, -1, 20000]], dtype=np.int16)
    path = str(tmp_path / "s.bin")
    write_matrix_file(path, arr, "int16", "big")
    got = blocks_to_numpy(read_matrix_blocks(spark, path, 2, 3, "int16", "big", n_blocks=2))
    assert np.isnan(got[0, 1]) and np.isnan(got[1, 1])
    assert got[0, 2] == 1.0 and got[0, 0] == 100 * INV_SHORT_MAX


def test_block_alignment(spark, tmp_path):
    arr = np.arange(23 * 4, dtype=np.float64).reshape(23, 4)
    path = str(tmp_path / "a.bin")
    write_matrix_file(path, arr, "float64", "big")
    blocks = read_matrix_blocks(spark, path, 23, 4, "float64", "big", n_blocks=7)
    rows = blocks.select("block_id", "start", "block_rows").collect()
    # 23 = 7*3 + 2 → first two blocks get 4 rows, rest 3; contiguous coverage
    sizes = {r["block_id"]: r["block_rows"] for r in rows}
    assert sizes == {0: 4, 1: 4, 2: 3, 3: 3, 4: 3, 5: 3, 6: 3}
    starts = sorted((r["start"], r["block_rows"]) for r in rows)
    acc = 0
    for s, n in starts:
        assert s == acc
        acc += n
    assert acc == 23


def test_generate_short_blocks_deterministic(spark):
    a = blocks_to_numpy(generate_short_blocks(spark, 50, 8, n_blocks=4, seed=11))
    b = blocks_to_numpy(generate_short_blocks(spark, 50, 8, n_blocks=4, seed=11))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (50, 8) and (a >= 0).all() and (a <= 1).all()


def test_matrix_multiply_file_end_to_end(spark, tmp_path):
    """MatrixMultiply parity: binary A scan -> broadcast-B GEMM -> gather,
    vs the local numpy product (the reference's -t test mode)."""
    from flink_mm_spark.linalg.gemm import matrix_multiply_file

    rng = np.random.RandomState(9)
    a = rng.standard_normal((64, 48))
    b = rng.standard_normal((48, 8))
    path = str(tmp_path / "A.bin")
    write_matrix_file(path, a, "float64", "big")
    c = matrix_multiply_file(spark, path, 64, 48, b, n_blocks=6)
    np.testing.assert_allclose(c, a @ b, rtol=1e-12)


def test_truncated_file_raises(spark, tmp_path):
    """A short file must fail loudly with block context, not mis-shape."""
    arr = np.arange(10 * 4, dtype=np.float64).reshape(10, 4)
    path = str(tmp_path / "t.bin")
    write_matrix_file(path, arr, "float64", "big")
    import os

    os.truncate(path, os.path.getsize(path) - 16)  # drop two cells
    blocks = read_matrix_blocks(spark, path, 10, 4, "float64", "big", n_blocks=2)
    with pytest.raises(Exception, match="truncated|expected"):
        blocks_to_numpy(blocks)
