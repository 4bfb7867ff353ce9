"""flink_mm_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `flink-mm` codebase (Flink 1.0 DataSet matrix/ML workloads; see
SURVEY.md), re-expressed Spark-first:

- Relational surface: DataFrame/SQL planned by Catalyst (scans, filters,
  joins, aggregations, windows, set ops) — see ``operators.relational``.
- Linear algebra: block-partitioned matrices as DataFrames with
  Arrow-vectorized pandas-UDF kernels (GEMM, stats, stress, BofZ) — see
  ``linalg``.
- Iterative algorithms: driver-coordinated loops (k-means, conjugate
  gradient, DA-MDS) — see ``algos``.
- Streaming: Structured Streaming over the ``events`` table — see
  ``streaming``.
- LLM-data-pipeline operators: dedup (exact/MinHash-LSH/SimHash), embedding
  similarity search, text analysis — see ``operators.dedup`` /
  ``operators.similarity`` / ``operators.text``.

Everything is designed for a large multi-executor cluster (broadcast joins
for dims, partial aggregation, pushdown-friendly scans) even though tests
run on local mode.
"""

__version__ = "0.1.0"

from flink_mm_spark.session import get_spark  # noqa: F401
