"""UDF/UDAF/UDTF surface demos (SURVEY §2.9).

The engine's extensibility tiers, each with a DuckDB-checked query:

- scalar/batch kernels: pandas_udf + mapInPandas/applyInPandas (used
  throughout linalg/dedup/multimodal);
- **UDAF**: grouped-aggregate pandas UDF (Arrow ships the whole group's
  column, numpy reduces it) — `label_centroid_udaf`;
- **UDTF**: a Python table function expanded via LATERAL join —
  `udtf_word_pairs`.

Both demos run on deliberately small slices: row-at-a-time UDTFs are the
slow path (SCALE.md); they exist for API parity, with the vectorized
equivalents (explode over JVM transform / grouped-agg) being the 100 TB
shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table

EMB_DIM = 64


@register(
    "label_centroid_udaf",
    oracle=f"""
    WITH idx AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS i),
    cells AS (
      SELECT label, i - 1 AS dim, CAST(emb[i] AS DOUBLE) AS v
      FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), idx
    )
    SELECT label, CAST(dim AS INT) AS dim,
           ROUND(SUM(CAST(v AS DECIMAL(18,9))) / COUNT(*), 6) AS centroid_v
    FROM cells GROUP BY label, dim ORDER BY label, dim
    """,
)
def label_centroid_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid via a grouped-aggregate pandas UDF.

    The UDAF receives each label's embeddings as one Arrow batch and
    reduces with numpy. Sums go through a fixed-precision integer grid
    (round to 1e-9) so the result is independent of row arrival order —
    the same determinism contract as relational.dsum.
    """
    @F.pandas_udf("array<double>")
    def centroid(embs: pd.Series) -> list[float]:
        m = np.vstack(embs.to_numpy())
        # quantize to the decimal(·,9) grid, sum exactly in int64, then divide
        q = np.round(m * 1e9).astype(np.int64)
        return (q.sum(axis=0) / (1e9 * len(q))).tolist()

    e = table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    agg = e.groupBy("label").agg(centroid("emb").alias("c"))
    return (
        agg.select("label", F.posexplode("c").alias("dim", "v"))
        .select("label", F.col("dim").cast("int").alias("dim"), F.round("v", 6).alias("centroid_v"))
        .orderBy("label", "dim")
    )


@register(
    "udtf_word_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           t[i] || ' ' || t[i + 1] AS pair
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
    ORDER BY doc_id, pos
    """,
)
def udtf_word_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive word bigrams via a Python UDTF + LATERAL join.

    One input row expands to n-1 output rows inside the table function —
    the §2.9 UDTF tier (Flink analogue: flatMap collector). Small slice by
    design; the production-scale equivalent is the JVM-side
    ``shingles_expr`` + explode used by the dedup pipeline.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, pair: string")
    class WordPairs:
        def eval(self, text: str):
            if text is None:
                return
            # mirror the oracle exactly: SQL trim strips SPACES only and
            # string_split_regex keeps empty edge tokens — so does re.split
            toks = re.split(r"\s+", text.lower().strip(" "))
            for i in range(len(toks) - 1):
                yield i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("word_pairs", WordPairs)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, p.pos, p.pair
        FROM _udtf_docs d, LATERAL word_pairs(d.text) p
        ORDER BY d.doc_id, p.pos
        """
    )
