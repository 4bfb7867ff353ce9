"""Extra relational operator contracts not expressible as value-hash checks."""

from __future__ import annotations

from flink_mm_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_approx_distinct_error_bound(spark):
    rows = registry.QUERIES["approx_distinct_users"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        exact, approx = r["exact_users"], r["approx_users"]
        assert abs(approx - exact) <= max(3, 0.05 * exact), r


def test_hll_twin_estimate_tracks_exact(spark):
    """The portable HLL twin's raw estimator must track the exact count
    within ~2 standard errors (1.04/sqrt(32) ~ 18%) once n >= 2.5m; below
    that (sf0.001: n=15) only the monotone register structure is checked."""
    rows = registry.QUERIES["hll_distinct_exact"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["registers_used"] <= 32
        assert r["harmonic_scaled"] > 0
        if r["exact_users"] >= 80:  # raw-HLL regime (2.5 * m)
            rel = abs(r["est_users"] / r["exact_users"] - 1.0)
            assert rel < 0.4, r


def test_count_min_overestimates_only(spark):
    """Count-min point estimates must upper-bound the true counts (the
    sketch's one-sided error guarantee) and equal them when the probe's
    columns are collision-free."""
    rows = registry.QUERIES["count_min_exact"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["est_count"] >= r["exact_count"] > 0, r
