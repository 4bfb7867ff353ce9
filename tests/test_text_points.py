"""Text points source: parse correctness, strict arity, centroid parsing."""

from __future__ import annotations

import numpy as np
import pytest

from flink_mm_spark.sources.text_points import read_centroids_text, read_points_text


def test_points_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(5)
    arr = rng.standard_normal((40, 3))
    path = tmp_path / "pts.txt"
    path.write_text("\n".join(" ".join(repr(v) for v in row) for row in arr) + "\n")
    got = read_points_text(spark, str(path), 3).collect()
    m = np.array(sorted([r["features"] for r in got]))
    np.testing.assert_array_equal(m, np.array(sorted(arr.tolist())))


def test_strict_arity_raises(spark, tmp_path):
    path = tmp_path / "bad.txt"
    path.write_text("1.0 2.0 3.0\n4.0 5.0\n")
    with pytest.raises(Exception, match="does not have exactly 3"):
        read_points_text(spark, str(path), 3).collect()
    # non-strict: malformed line becomes a null row instead
    rows = read_points_text(spark, str(path), 3, strict=False).collect()
    assert sum(r["features"] is None for r in rows) == 1


def test_centroids_parse(spark, tmp_path):
    path = tmp_path / "c.txt"
    path.write_text("1 0.5 0.25\n2 -1.0 3.5\n")
    got = {r["id"]: r["features"] for r in read_centroids_text(spark, str(path), 2).collect()}
    assert got == {1: [0.5, 0.25], 2: [-1.0, 3.5]}


def test_nonstrict_bad_token_is_null_row(spark, tmp_path):
    """Under ANSI mode a non-numeric token must not abort the scan when
    strict=False (try_cast path)."""
    path = tmp_path / "tok.txt"
    path.write_text("1.0 2.0 3.0\n4.0 abc 6.0\n")
    rows = read_points_text(spark, str(path), 3, strict=False).collect()
    assert sum(r["features"] is None for r in rows) == 1
    assert sum(r["features"] is not None for r in rows) == 1


def test_centroids_arity_raises(spark, tmp_path):
    path = tmp_path / "cb.txt"
    path.write_text("1 0.5 0.25\n2 0.5\n")
    import pytest as _pt

    with _pt.raises(Exception, match="centroid line"):
        read_centroids_text(spark, str(path), 2).collect()
