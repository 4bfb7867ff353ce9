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


def test_binmatrix_datasource_i16_nulls_and_reregistration(spark):
    """The connector's int16 path must emit explicit NULLs for negative
    (missing) shorts and dequantize the rest; registration is idempotent."""
    import numpy as np

    from flink_mm_spark.sources.binary_matrix import ensure_fixture, formula_i16
    from flink_mm_spark.sources.datasource import register_binmatrix

    register_binmatrix(spark)
    register_binmatrix(spark)  # re-register must not raise
    path = ensure_fixture(500, 96, "int16", "little")
    df = (
        spark.read.format("binmatrix")
        .option("rows", 500)
        .option("cols", 96)
        .option("cell", "int16")
        .option("byteorder", "little")
        .option("blocks", 8)
        .load(path)
    )
    rows = df.orderBy("block_id").collect()
    assert [r["block_id"] for r in rows] == list(range(8))
    want = formula_i16(500, 96)
    got0 = rows[0]["data"]
    blk_rows = rows[0]["block_rows"]
    w0 = want[:blk_rows].ravel()
    assert len(got0) == blk_rows * 96
    for g, w in zip(got0[:500], w0[:500]):
        if w < 0:
            assert g is None
        else:
            assert abs(g - w / 32767.0) < 1e-12


def test_binmatrix_pushdown_prunes_partitions(spark):
    """block_id predicates must prune InputPartitions (bytes of pruned
    blocks are never read) and still return exactly the right rows."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from flink_mm_spark.sources.binary_matrix import ensure_fixture
    from flink_mm_spark.sources.datasource import BinMatrixReader, register_binmatrix

    # unit level: the reader consumes block_id filters and prunes
    opts = {"path": "/dev/null", "rows": "500", "cols": "96", "blocks": "16"}
    r = BinMatrixReader(opts)
    leftover = list(r.pushFilters([EqualTo(("block_id",), 3)]))
    assert leftover == []  # fully consumed
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].block_id == 3

    r2 = BinMatrixReader(opts)
    assert list(r2.pushFilters([GreaterThan(("block_id",), 13)])) == []
    assert [p.block_id for p in r2.partitions()] == [14, 15]

    # inclusive bounds: Spark emits GreaterThanOrEqual for `block_id >= k`
    # (the e2e filter below) — they must be consumed and prune exactly
    # (ADVICE r3: strict-only consumption forfeited pruning on >= / <=)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    r3 = BinMatrixReader(opts)
    assert (
        list(
            r3.pushFilters(
                [GreaterThanOrEqual(("block_id",), 6), LessThanOrEqual(("block_id",), 8)]
            )
        )
        == []
    )
    assert [p.block_id for p in r3.partitions()] == [6, 7, 8]

    # end to end: filtered read equals the unfiltered read's subset
    register_binmatrix(spark)
    path = ensure_fixture(500, 96, "float64", "big")
    reader = (
        spark.read.format("binmatrix")
        .option("rows", 500)
        .option("cols", 96)
        .option("cell", "float64")
        .option("byteorder", "big")
        .option("blocks", 16)
    )
    full = {r["block_id"]: r["start"] for r in reader.load(path).collect()}
    got = reader.load(path).filter("block_id >= 6 AND block_id < 9").collect()
    assert {r["block_id"] for r in got} == {6, 7, 8}
    for r in got:
        assert r["start"] == full[r["block_id"]]


def test_binmatrix_sink_i16_roundtrip_with_missing(spark, tmp_path):
    """Distributed sink: int16 blocks with NULL (missing) cells must write
    negative shorts and re-read as NULLs; valid cells round-trip through
    quantization bit-exactly."""
    from flink_mm_spark.sources.binary_matrix import ensure_fixture, formula_i16
    from flink_mm_spark.sources.datasource import register_binmatrix

    register_binmatrix(spark)
    src = ensure_fixture(500, 96, "int16", "little")
    dst = str(tmp_path / "rt.i16.bin")

    def conn(x, **extra):
        x = x.option("rows", 500).option("cols", 96).option("cell", "int16").option(
            "byteorder", "little"
        )
        for k, v in extra.items():
            x = x.option(k, v)
        return x

    blocks = conn(spark.read.format("binmatrix"), blocks=16).load(src)
    conn(blocks.write.format("binmatrix").mode("overwrite")).save(dst)

    want = formula_i16(500, 96).ravel()
    got = np.fromfile(dst, dtype="<i2")
    assert got.size == want.size
    # negative (missing) cells may write any negative marker; we use -1
    assert (got[want < 0] == -1).all()
    np.testing.assert_array_equal(got[want >= 0], want[want >= 0].astype(np.int16))


def test_binmatrix_sink_rejects_append_and_bad_shape(spark, tmp_path):
    from flink_mm_spark.sources.datasource import BinMatrixWriter

    with pytest.raises(Exception, match="overwrite"):
        BinMatrixWriter(
            {"path": str(tmp_path / "x.bin"), "rows": "4", "cols": "2"}, overwrite=False
        )
    # commit must reject row-coverage gaps
    w = BinMatrixWriter(
        {"path": str(tmp_path / "y.bin"), "rows": "10", "cols": "2"}, overwrite=True
    )
    from flink_mm_spark.sources.datasource import _BlocksWritten

    with pytest.raises(Exception, match="coverage"):
        w.commit([_BlocksWritten([(0, 0, 4)]), _BlocksWritten([(2, 6, 4)])])


def test_binmatrix_stream_offsets_replayable(spark):
    """readBetweenOffsets must deterministically replay exactly the blocks
    of an offset range (the recovery contract), and offsets must advance
    stream_batch blocks per read."""
    from flink_mm_spark.sources.binary_matrix import ensure_fixture
    from flink_mm_spark.sources.datasource import BinMatrixStreamReader

    path = ensure_fixture(500, 96, "float64", "big")
    opts = {
        "path": path, "rows": "500", "cols": "96", "cell": "float64",
        "byteorder": "big", "blocks": "16", "stream_batch": "5",
    }
    r = BinMatrixStreamReader(opts)
    assert r.initialOffset() == {"block": 0}
    batch1, off1 = r.read({"block": 0})
    rows1 = list(batch1)
    assert off1 == {"block": 5} and [t[0] for t in rows1] == [0, 1, 2, 3, 4]
    batch2, off2 = r.read(off1)
    assert off2 == {"block": 10}
    # replay of the first range is bit-identical
    replay = list(BinMatrixStreamReader(opts).readBetweenOffsets({"block": 0}, {"block": 5}))
    assert [t[0] for t in replay] == [0, 1, 2, 3, 4]
    assert replay[0][5] == rows1[0][5]  # same data payload
    # tail range clamps
    tail, off_end = BinMatrixStreamReader(opts).read({"block": 15})
    assert off_end == {"block": 16} and [t[0] for t in list(tail)] == [15]


def test_binmatrix_pushdown_in_filter(spark):
    """isin() pushes an In filter; the connector must prune to exactly the
    listed blocks (regression: pyspark's In carries .value, not .values)."""
    from pyspark.sql.datasource import In

    from flink_mm_spark.sources.binary_matrix import ensure_fixture
    from flink_mm_spark.sources.datasource import BinMatrixReader, register_binmatrix

    r = BinMatrixReader({"path": "/dev/null", "rows": "500", "cols": "96", "blocks": "16"})
    assert list(r.pushFilters([In(("block_id",), (2, 5))])) == []
    assert [p.block_id for p in r.partitions()] == [2, 5]

    from pyspark.sql import functions as F

    register_binmatrix(spark)
    path = ensure_fixture(500, 96, "float64", "big")
    got = (
        spark.read.format("binmatrix")
        .option("rows", 500).option("cols", 96).option("cell", "float64")
        .option("byteorder", "big").option("blocks", 16)
        .load(path)
        .filter(F.col("block_id").isin(1, 14))
        .collect()
    )
    assert {r["block_id"] for r in got} == {1, 14}


def test_binmatrix_sink_failure_preserves_existing_file(tmp_path):
    """The sink writes to a temp and renames at commit, so neither writer
    construction nor abort touches a pre-existing destination file."""
    import os

    from flink_mm_spark.sources.datasource import BinMatrixWriter, _BlocksWritten

    dst = tmp_path / "keep.bin"
    dst.write_bytes(b"PRECIOUS")
    w = BinMatrixWriter(
        {"path": str(dst), "rows": "10", "cols": "2"}, overwrite=True
    )
    assert dst.read_bytes() == b"PRECIOUS"  # plan-time did not clobber
    assert os.path.exists(w.tmp_path)
    w.abort([])
    assert not os.path.exists(w.tmp_path)
    assert dst.read_bytes() == b"PRECIOUS"
    # a failed commit (coverage gap) also leaves the destination alone
    w2 = BinMatrixWriter({"path": str(dst), "rows": "10", "cols": "2"}, overwrite=True)
    try:
        w2.commit([_BlocksWritten([(0, 0, 4)])])
    except ValueError:
        pass
    assert dst.read_bytes() == b"PRECIOUS"
