"""The t2 gate, locally: every registered query vs its DuckDB oracle.

Parametrized over the whole registry at sf0.001 (fast); rows-only queries
are executed for schema stability and non-failure. A slower sf0.01 pass for
the SQL-checked queries runs under ``-m medium`` (the driver's actual SF).
"""

from __future__ import annotations

import pytest

from flink_mm_spark import registry
from tests.conftest import SF_DIR, SF_DIR_MEDIUM, assert_matches_oracle

registry.load_all()

ALL = sorted(registry.QUERIES)
WITH_ORACLE = [n for n in ALL if registry.QUERIES[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if registry.QUERIES[n].oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match_sf0001(spark, name):
    spec = registry.QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, spec.oracle, SF_DIR)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = registry.QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


@pytest.mark.medium
@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match_sf001(spark, name):
    spec = registry.QUERIES[name]
    df = spec.fn(spark, SF_DIR_MEDIUM)
    assert_matches_oracle(df, spec.oracle, SF_DIR_MEDIUM)
