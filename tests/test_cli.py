"""CLI surface (`python -m flink_mm_spark`): the reference-program parity
entry points (MIGRATION.md)."""

from __future__ import annotations

import numpy as np

from flink_mm_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out and "queries registered" in out


def test_cli_run_unknown_query():
    assert main(["run", "no_such_query"]) == 2


def test_cli_run_query(spark, capsys):
    # reuses the session via getOrCreate; prints rows
    assert main(["run", "binary_f64_scan", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "row_id" in out


def test_cli_damds_reference_config(spark, tmp_path, monkeypatch):
    """The reference's own config.properties shape drives the anneal via the
    CLI (GenerateData mode), and final points land in OutputFolder/OutFile
    in the reference's index<TAB>coords layout."""
    cfg = tmp_path / "config.properties"
    cfg.write_text(
        "NumberDataPoints=40\nTargetDimension=3\nCGIterations=4\n"
        "Threshold = 0.0001\nIsSammon = false\nAlpha = .5\nTminFactor = 0.5\n"
        "CGErrorThreshold = 0.0001\nMaxStressLoops = 1\nMaxTempLoops = 2\n"
        "GenerateData=true\n"
        f"OutputFolder={tmp_path}/out\nOutFile=final.txt\n"
    )
    assert main(["damds", str(cfg), "--blocks", "4"]) == 0
    lines = (tmp_path / "out" / "final.txt").read_text().strip().splitlines()
    assert len(lines) == 40
    first = lines[0].split("\t")
    assert first[0] == "0" and len(first) == 4
    assert all(np.isfinite(float(v)) for v in first[1:])


def test_cli_kmeans_files(spark, tmp_path):
    from flink_mm_spark.sources.text_points import (
        ensure_centroids_fixture,
        ensure_points_fixture,
    )

    pts, cents = ensure_points_fixture(), ensure_centroids_fixture()
    out = tmp_path / "final_centroids.txt"
    assert main(
        ["kmeans", "--points", pts, "--centroids", cents, "--dim", "4",
         "--iters", "2", "--out", str(out)]
    ) == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 300
    assert len(lines[0].split("\t")) == 5  # id + 4 coords
