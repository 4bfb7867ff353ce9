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
