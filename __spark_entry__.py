"""Driver contract for the spark-graft builder (PySpark target).

Exposes the flink_mm_spark query registry: every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extras) is one ``queries()`` entry; the
SQL-expressible ones carry a DuckDB oracle in ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_mm_spark import registry
from flink_mm_spark.session import tune_session

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return registry.QUERIES["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return registry.QUERIES[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in registry.ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {
        name: registry.QUERIES[name].oracle
        for name in registry.ordered_names()
        if registry.QUERIES[name].oracle is not None
    }
