from flink_mm_spark.linalg.block_matrix import (  # noqa: F401
    BLOCK_SCHEMA,
    blocks_from_numpy,
    blocks_to_numpy,
    blocks_to_cells,
)
from flink_mm_spark.linalg.gemm import gemm_broadcast  # noqa: F401
