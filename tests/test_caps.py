"""Guard: per-document analysis caps stay INACTIVE on the graded corpora.

media_audio_energy and rolling_fingerprints cap the frames / window starts
analyzed per document, with the SAME cap applied in the Spark kernel and the
DuckDB oracle (ADVICE r1: the oracle's enumeration is necessarily bounded;
an unbounded Spark side silently diverges past it). Correctness no longer
depends on corpus size — but these tests assert the caps don't truncate at
any graded scale factor, so the registered semantics remain "full document
analyzed". If the testdata generator ever produces longer documents, this
fails loudly instead of silently switching to prefix semantics.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from flink_mm_spark.operators.multimodal import FRAME, MAX_FRAMES
from flink_mm_spark.operators.text import _RH_K, _RH_MAX_STARTS

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_audio_frames_under_cap(sf_dir):
    con = duckdb.connect()
    (max_len,) = con.execute(
        f"SELECT COALESCE(MAX(length(text)), 0) FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id % 3 = 1 AND doc_id < 300"
    ).fetchone()
    assert max_len // FRAME <= MAX_FRAMES, (
        f"audio doc of {max_len} bytes exceeds MAX_FRAMES={MAX_FRAMES}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_rolling_hash_starts_under_cap(sf_dir):
    con = duckdb.connect()
    (max_len,) = con.execute(
        f"SELECT COALESCE(MAX(length(text)), 0) FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id < 100"
    ).fetchone()
    assert max_len - _RH_K + 1 <= _RH_MAX_STARTS, (
        f"doc of {max_len} chars exceeds _RH_MAX_STARTS={_RH_MAX_STARTS}"
    )
