"""Query registry: the single source of truth for the engine's query surface.

Every operator/query the engine claims (SURVEY.md §2 inventory + the
LLM-data-pipeline extras) registers here with:

- a Spark builder ``fn(spark, sf_dir) -> DataFrame``
- an optional DuckDB-equivalent ANSI SQL string (the correctness oracle);
  ``None`` marks genuinely non-SQL-expressible ops (iterative algorithms,
  custom stateful streaming) which get a weaker rows-only check.

``__spark_entry__.py`` exposes this registry to the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import flink_mm_spark.operators.relational  # noqa: F401
    import flink_mm_spark.operators.dedup  # noqa: F401
    import flink_mm_spark.operators.similarity  # noqa: F401
    import flink_mm_spark.operators.text  # noqa: F401
    import flink_mm_spark.operators.multimodal  # noqa: F401
    import flink_mm_spark.sources.binary_matrix  # noqa: F401
    import flink_mm_spark.sources.text_points  # noqa: F401
    import flink_mm_spark.operators.udf_surface  # noqa: F401
    import flink_mm_spark.linalg.queries  # noqa: F401
    import flink_mm_spark.algos.queries  # noqa: F401
