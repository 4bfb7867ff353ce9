"""DA-MDS: deterministic-annealing multidimensional scaling (SMACOF).

Reference: the damds package — quantized int16 distance/weight matrices
partitioned into row blocks, per-temperature SMACOF stress majorization
with a conjugate-gradient inner solve (SURVEY §2.6 F2,F6–F10, §3.1).

Spark shape:
- The N×N distance (+ optional weight) matrix lives as a DataFrame of row
  blocks (block_id, start, block_rows, n_points, dist ARRAY<SHORT>,
  weight ARRAY<SHORT>), persisted once for the whole anneal — the
  loop-invariant caching the reference lacks (it re-reads files every
  Flink job, SURVEY §4.1).
- The embedding X is (N, 3)-tiny and lives on the driver; each distributed
  kernel broadcasts X and emits per-block partials (stress scalars or
  block slices of B(Z)X / VX), gathered ordered by block_id (SURVEY A6).
- The CG loop (damds/CG.java:78-142) runs on the driver: the only
  distributed step per CG iteration is the V×p multiply.

Quantization semantics (damds/DAMDSUtils.java:8-9): value = short/32767;
negative shorts are missing pairs and are skipped everywhere
(damds/Statistics.java:39-42, Stress.java:75-77, BC.java:121-123).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from flink_mm_spark.linalg.block_matrix import split_rows
from flink_mm_spark.sources.binary_matrix import INV_SHORT_MAX  # single source

# Read-time weight transformation hook: (weights, dequantized distances) →
# weights. The Spark analogue of the reference's TransformationFunction
# config (damds/configuration/section/DAMDSSection.java:40-41).
WeightTransform = Callable[[np.ndarray, np.ndarray], np.ndarray]

DAMDS_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("block_rows", T.IntegerType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("dist", T.ArrayType(T.ShortType(), False), False),
        T.StructField("weight", T.ArrayType(T.ShortType(), False), True),
    ]
)


def damds_blocks(
    spark: SparkSession,
    dist: np.ndarray,
    weights: np.ndarray | None = None,
    n_blocks: int = 16,
) -> DataFrame:
    """Partition quantized int16 distance (+weight) matrices into row blocks.

    Driver-side constructor for matrices that already exist as numpy arrays
    (tests, small benchmarks). The scale constructors — no O(N²) driver
    materialization — are ``damds_blocks_from_files`` (side files, per-task
    offset reads) and ``damds_blocks_from_points`` (distributed pairwise
    kernel over a points DataFrame).
    """
    dist = np.asarray(dist, dtype=np.int16)
    if weights is not None:
        weights = np.asarray(weights, dtype=np.int16)
    n = dist.shape[0]
    rows = []
    for b, start, nrows in split_rows(n, n_blocks):
        w = None if weights is None else weights[start : start + nrows].ravel().tolist()
        rows.append((b, start, nrows, n, dist[start : start + nrows].ravel().tolist(), w))
    df = spark.createDataFrame(rows, DAMDS_BLOCK_SCHEMA)
    return df.repartition(min(n_blocks, 64), "block_id").persist(StorageLevel.MEMORY_AND_DISK)


def _block_arrays(pdf: pd.DataFrame) -> Iterator[tuple[int, int, np.ndarray, np.ndarray | None]]:
    for _, row in pdf.iterrows():
        nrows, npts = int(row["block_rows"]), int(row["n_points"])
        d = np.asarray(row["dist"], dtype=np.int16).reshape(nrows, npts)
        w = row["weight"]
        wm = None if w is None else np.asarray(w, dtype=np.int16).reshape(nrows, npts)
        yield int(row["block_id"]), int(row["start"]), d, wm


def _weights_of(
    dq: np.ndarray, wblock: np.ndarray | None, wt: WeightTransform | None = None
) -> np.ndarray:
    """Dequantized weights; default weight 1 where the distance exists.

    ``wt`` is the read-time weight transformation hook (the reference's
    TransformationFunction config, io/RowBlock.java:27-28,88-96 / SURVEY
    §2.9); it receives (weights, dequantized distances) per block.
    """
    if wblock is None:
        base = (dq >= 0).astype(np.float64)
    else:
        base = np.where(dq >= 0, wblock.astype(np.float64) * INV_SHORT_MAX, 0.0)
    if wt is not None:
        base = np.where(dq >= 0, wt(base, dq.astype(np.float64) * INV_SHORT_MAX), 0.0)
    return base


def sammon_transform(sammon_factor: float, avg_dist: float) -> WeightTransform:
    """Sammon weighting w → w / max(d, sammonFactor·avgDistance)
    (io/RowBlock.java:139-142, SURVEY F11)."""
    floor = sammon_factor * avg_dist

    def wt(w: np.ndarray, d: np.ndarray) -> np.ndarray:
        return w / np.maximum(d, floor)

    return wt


@dataclass
class MatrixStats:
    """DoubleStatistics (damds/Statistics.java) over non-missing cells."""

    count: int
    min: float
    max: float
    positive_min: float
    sum: float
    sum_sq: float


def matrix_stats(blocks: DataFrame) -> MatrixStats:
    """Distributed count/min/max/positiveMin/sum/sumSq of dequantized cells."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for _bid, _start, d, _w in _block_arrays(pdf):
                dq = d.astype(np.float64) * INV_SHORT_MAX
                v = dq[d >= 0]
                if v.size == 0:
                    continue
                pos = v[v > 0]
                out.append(
                    (
                        int(v.size),
                        float(v.min()),
                        float(v.max()),
                        float(pos.min()) if pos.size else np.inf,
                        float(v.sum()),
                        float((v * v).sum()),
                    )
                )
        yield pd.DataFrame(out, columns=["cnt", "mn", "mx", "pmin", "sm", "ssq"])

    rows = (
        blocks.mapInPandas(
            partials, "cnt bigint, mn double, mx double, pmin double, sm double, ssq double"
        )
        .groupBy()
        .agg(
            F.sum("cnt").alias("cnt"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.min("pmin").alias("pmin"),
            F.sum("sm").alias("sm"),
            F.sum("ssq").alias("ssq"),
        )
        .collect()[0]
    )
    return MatrixStats(rows["cnt"], rows["mn"], rows["mx"], rows["pmin"], rows["sm"], rows["ssq"])


def _gather_block_matrix(df: DataFrame, dim: int) -> np.ndarray:
    """Ordered gather of per-block (block_rows, dim) partials → (N, dim).

    Arrow collect (toPandas) + driver-side sort: the kernels run ~10× per
    stress iteration, so per-gather latency is the anneal's critical path.
    """
    pdf = df.toPandas().sort_values("block_id")
    return np.vstack(
        [np.asarray(d, dtype=np.float64).reshape(-1, dim) for d in pdf["data"]]
    )


_PART_SCHEMA = "block_id int, data array<double>"


def stress(
    blocks: DataFrame, x: np.ndarray, t_cur: float, inv_sum_dsq: float, wt=None
) -> float:
    """Stress σ(X) (damds/Stress.java:45-93, SURVEY F7).

    tmpD = (δ ≥ diff ? δ − diff : 0) − d_ij(X); σ = Σ w·tmpD² × invΣδ²;
    diff = √(2·dim)·tCur when tCur > 1e-10.
    """
    spark = blocks.sparkSession
    dim = x.shape[1]
    diff = float(np.sqrt(2.0 * dim) * t_cur) if t_cur > 1e-10 else 0.0
    x_bc = spark.sparkContext.broadcast(np.asarray(x, dtype=np.float64))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xv = x_bc.value
        out = []
        for pdf in batches:
            for bid, start, d, wblk in _block_arrays(pdf):
                dq = d.astype(np.float64) * INV_SHORT_MAX
                w = _weights_of(d, wblk, wt)
                xb = xv[start : start + d.shape[0]]
                dist_x = np.sqrt(
                    np.maximum(
                        (xb * xb).sum(1)[:, None]
                        - 2.0 * (xb @ xv.T)
                        + (xv * xv).sum(1)[None, :],
                        0.0,
                    )
                )
                heated = np.where(dq >= diff, dq - diff, 0.0)
                tmp = heated - dist_x
                out.append((bid, [float((w * tmp * tmp * (d >= 0)).sum())]))
        yield pd.DataFrame(out, columns=["block_id", "data"])

    total = (
        blocks.mapInPandas(partials, _PART_SCHEMA)
        .select(F.explode("data").alias("v"))
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    x_bc.destroy()  # per-call broadcast; the job completed with collect()
    return float(total) * inv_sum_dsq


def stress_bofz(
    blocks: DataFrame, x: np.ndarray, t_cur: float, inv_sum_dsq: float, wt=None
) -> tuple[float, np.ndarray]:
    """Fused σ(X) + B(Z)·Z in ONE distributed job (one barrier, one pass).

    The SMACOF loop evaluates stress(X_i) at the end of iteration i and
    BofZ(X_i) at the start of iteration i+1 — same X, same t, same blocks,
    and both kernels are dominated by the identical (block_rows × N)
    distance computation. Fusing halves that work and removes one
    synchronization barrier per iteration (at 1000 executors, barriers are
    the anneal's critical path). Float semantics are IDENTICAL to running
    ``stress`` then ``bofz_bc``: the shared dist_x is the same value both
    kernels computed independently, and each output applies the same op
    sequence to it — so results are bitwise equal and the numpy test
    oracles are unchanged. Each block emits [σ_partial, *bz_slice].
    """
    spark = blocks.sparkSession
    dim = x.shape[1]
    diff = float(np.sqrt(2.0 * dim) * t_cur) if t_cur > 1e-10 else 0.0
    x_bc = spark.sparkContext.broadcast(np.asarray(x, dtype=np.float64))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xv = x_bc.value
        out = []
        for pdf in batches:
            for bid, start, d, wblk in _block_arrays(pdf):
                dq = d.astype(np.float64) * INV_SHORT_MAX
                w = _weights_of(d, wblk, wt)
                nrows = d.shape[0]
                xb = xv[start : start + nrows]
                dist_x = np.sqrt(
                    np.maximum(
                        (xb * xb).sum(1)[:, None]
                        - 2.0 * (xb @ xv.T)
                        + (xv * xv).sum(1)[None, :],
                        0.0,
                    )
                )
                # stress partial (Stress.java:45-93 semantics)
                heated = np.where(dq >= diff, dq - diff, 0.0)
                tmp = heated - dist_x
                sp = float((w * tmp * tmp * (d >= 0)).sum())
                # BofZ slice (BC.java:86-134 semantics)
                ok = (dist_x >= 1e-10) & (dq > diff) & (d >= 0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    b = np.where(ok, -w * (dq - diff) / np.where(ok, dist_x, 1.0), 0.0)
                cols = np.arange(d.shape[1])
                diag_mask = cols[None, :] == (start + np.arange(nrows))[:, None]
                b = np.where(diag_mask, 0.0, b)
                diag = -b.sum(axis=1)
                bz = b @ xv + diag[:, None] * xb
                out.append((bid, [sp] + bz.ravel().tolist()))
        yield pd.DataFrame(out, columns=["block_id", "data"])

    pdf = blocks.mapInPandas(partials, _PART_SCHEMA).toPandas().sort_values("block_id")
    x_bc.destroy()
    total = 0.0
    slices = []
    for d in pdf["data"]:
        a = np.asarray(d, dtype=np.float64)
        total += a[0]
        slices.append(a[1:].reshape(-1, dim))
    return float(total) * inv_sum_dsq, np.vstack(slices)


def v_array(blocks: DataFrame, wt=None) -> np.ndarray:
    """v_i = 1 + Σ_{j≠i, δ_ij≥0, w_ij≠0} w_ij (damds/VArray.java:49-67, F8)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = []
        for pdf in batches:
            for bid, start, d, wblk in _block_arrays(pdf):
                w = _weights_of(d, wblk, wt)
                nrows = d.shape[0]
                cols = np.arange(d.shape[1])
                diag = cols[None, :] == (start + np.arange(nrows))[:, None]
                v = 1.0 + np.where(diag, 0.0, w).sum(axis=1)
                out.append((bid, v.tolist()))
        yield pd.DataFrame(out, columns=["block_id", "data"])

    return _gather_block_matrix(blocks.mapInPandas(partials, _PART_SCHEMA), 1).ravel()


def bofz_bc(blocks: DataFrame, x: np.ndarray, t_cur: float, wt=None) -> np.ndarray:
    """BC = B(Z)·Z for the SMACOF update (damds/BC.java:86-134, F6).

    Off-diag B_ij = −w_ij·(δ_ij − diff)/d_ij(Z) when d_ij ≥ 1e-10 and
    diff < δ_ij, else 0; diagonal B_ii = −Σ_{j≠i} B_ij. Each block emits
    its (block_rows, dim) slice of B·Z; gathered ordered by block.
    """
    spark = blocks.sparkSession
    dim = x.shape[1]
    diff = float(np.sqrt(2.0 * dim) * t_cur) if t_cur > 1e-10 else 0.0
    x_bc = spark.sparkContext.broadcast(np.asarray(x, dtype=np.float64))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xv = x_bc.value
        out = []
        for pdf in batches:
            for bid, start, d, wblk in _block_arrays(pdf):
                dq = d.astype(np.float64) * INV_SHORT_MAX
                w = _weights_of(d, wblk, wt)
                nrows = d.shape[0]
                xb = xv[start : start + nrows]
                dist_z = np.sqrt(
                    np.maximum(
                        (xb * xb).sum(1)[:, None]
                        - 2.0 * (xb @ xv.T)
                        + (xv * xv).sum(1)[None, :],
                        0.0,
                    )
                )
                ok = (dist_z >= 1e-10) & (dq > diff) & (d >= 0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    b = np.where(ok, -w * (dq - diff) / np.where(ok, dist_z, 1.0), 0.0)
                cols = np.arange(d.shape[1])
                diag_mask = cols[None, :] == (start + np.arange(nrows))[:, None]
                b = np.where(diag_mask, 0.0, b)
                diag = -b.sum(axis=1)
                bz = b @ xv + diag[:, None] * xb
                out.append((bid, bz.ravel().tolist()))
        yield pd.DataFrame(out, columns=["block_id", "data"])

    out = _gather_block_matrix(blocks.mapInPandas(partials, _PART_SCHEMA), dim)
    x_bc.destroy()
    return out


def v_multiply(blocks: DataFrame, v, p: np.ndarray, wt=None) -> np.ndarray:
    """V·p where V = diag(v) with off-diag −w_ij (SURVEY F2).

    The reference computes this via MatrixUtils.matrixMultiplyWithThreadOffset
    (damds/CG.java:411-421); here each block does
    out = v_block·p_block − W_nodiag_block @ p in numpy and the slices are
    gathered ordered.

    ``v`` may be a numpy array or an already-created Broadcast of one: v is
    invariant across the whole anneal (it depends only on the weights), so
    ``damds`` broadcasts it ONCE and every CG iteration reuses it — only the
    O(N·dim) search direction ``p`` ships per iteration.
    """
    from pyspark.broadcast import Broadcast

    spark = blocks.sparkSession
    dim = p.shape[1]
    p_bc = spark.sparkContext.broadcast(np.asarray(p, dtype=np.float64))
    own_v = not isinstance(v, Broadcast)
    v_bc = (
        spark.sparkContext.broadcast(np.asarray(v, dtype=np.float64)) if own_v else v
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pv = p_bc.value
        vv = v_bc.value
        out = []
        for pdf in batches:
            for bid, start, d, wblk in _block_arrays(pdf):
                w = _weights_of(d, wblk, wt)
                nrows = d.shape[0]
                cols = np.arange(d.shape[1])
                diag_mask = cols[None, :] == (start + np.arange(nrows))[:, None]
                w = np.where(diag_mask, 0.0, w)
                pb = pv[start : start + nrows]
                res = vv[start : start + nrows, None] * pb - w @ pv
                out.append((bid, res.ravel()))
        yield pd.DataFrame(out, columns=["block_id", "data"])

    out = _gather_block_matrix(blocks.mapInPandas(partials, _PART_SCHEMA), dim)
    p_bc.destroy()
    if own_v:
        v_bc.destroy()
    return out


def v_multiply_uniform(n_points: int, p: np.ndarray) -> np.ndarray:
    """Closed-form V×p for the UNIFORM-weight case (w ≡ 1, every pair
    observed — the ``damds_blocks_from_points`` / streaming shape).

    With uniform weights the SMACOF V matrix is fully structured:
    v_ii = 1 + (N−1) = N (``v_array``'s +1 regularization included),
    v_ij = −1, so (V·p)_i = (N+1)·p_i − Σ_j p_j — exact math, not an
    approximation. Detecting this case turns the distributed multiply
    inside every CG iteration (one cluster barrier + an O(N²)-weight
    block pass in the general case) into O(N·dim) driver arithmetic:
    **zero distributed jobs for the entire CG solve**. The weighted /
    Sammon paths (side-file fixtures, ``damds_embed``) are untouched —
    they still need the real V and take ``v_multiply``.
    """
    p = np.asarray(p, dtype=np.float64)
    return (n_points + 1.0) * p - p.sum(axis=0, keepdims=True)


def cg_solve(
    blocks: DataFrame,
    v,  # np.ndarray or Broadcast[np.ndarray] (see v_multiply)
    bc_target: np.ndarray,
    x0: np.ndarray,
    cg_iters: int = 20,
    cg_threshold: float = 1e-5,
    wt: WeightTransform | None = None,
    uniform_n: int | None = None,
) -> tuple[np.ndarray, int]:
    """Conjugate gradient for V·X = BC (damds/CG.java:78-142, F9/I2).

    X, r, p are (N, dim)-tiny driver arrays; the distributed step per
    iteration is the single V×p multiply — or, when ``uniform_n`` marks
    the uniform-weight case, the ``v_multiply_uniform`` closed form with
    no distributed work at all. Returns (X, iterations used).
    """

    def mult(vec: np.ndarray) -> np.ndarray:
        if uniform_n is not None:
            return v_multiply_uniform(uniform_n, vec)
        return v_multiply(blocks, v, vec, wt)

    x = np.asarray(x0, dtype=np.float64).copy()
    r = bc_target - mult(x)
    p = r.copy()
    r_tr = float((r * r).sum())
    test_end = r_tr * cg_threshold
    it = 0
    while it < cg_iters and r_tr > test_end:
        ap = mult(p)
        alpha = r_tr / float((p * ap).sum())
        x += alpha * p
        r -= alpha * ap
        r_tr_new = float((r * r).sum())
        beta = r_tr_new / r_tr
        r_tr = r_tr_new
        p = r + beta * p
        it += 1
    return x, it


@dataclass
class DamdsResult:
    points: np.ndarray
    stress: float
    temp_loops: int
    stress_iters: int


def damds(
    blocks: DataFrame,
    n_points: int,
    dim: int = 3,
    alpha: float = 0.95,
    t_min_factor: float = 0.5,
    max_temp_loops: int = 4,
    max_stress_loops: int = 20,
    stress_threshold: float = 1e-4,
    cg_iters: int = 8,
    cg_threshold: float = 1e-5,
    seed: int = 42,
    sammon_factor: float | None = None,
    x0: np.ndarray | None = None,
    uniform_weights: bool = False,
) -> DamdsResult:
    """Full deterministic-annealing SMACOF driver loop (SURVEY I3/F10).

    Temperature schedule: tMax = max/√(2·dim), tCur = α·tMax, cooled by α
    per temp loop, floored to 0 below tMin = tMinFactor·positiveMin/√(2·dim)
    (damds/DAMDS.java:121-152, 234-238). Inner loop iterates SMACOF updates
    (BC then CG) until relative stress change < threshold.
    """
    stats = matrix_stats(blocks)
    if n_points < 2 or stats.sum_sq <= 0.0 or not np.isfinite(stats.positive_min):
        # degenerate matrix (single point / all-identical vectors): nothing
        # to embed — reachable from IncrementalMDS's first tiny micro-batch
        rng = np.random.RandomState(seed)
        x = rng.uniform(-0.5, 0.5, size=(n_points, dim))
        if x0 is not None:
            k = min(len(x0), n_points)
            x[:k] = np.asarray(x0, dtype=np.float64)[:k, :dim]
        return DamdsResult(points=x, stress=0.0, temp_loops=0, stress_iters=0)
    wt = (
        sammon_transform(sammon_factor, stats.sum / stats.count)
        if sammon_factor is not None
        else None
    )
    inv_sum_dsq = 1.0 / stats.sum_sq
    sqrt2d = float(np.sqrt(2.0 * dim))
    t_max = stats.max / sqrt2d
    t_min = t_min_factor * stats.positive_min / sqrt2d
    t_cur = alpha * t_max

    rng = np.random.RandomState(seed)
    x = rng.uniform(-0.5, 0.5, size=(n_points, dim))
    if x0 is not None:
        # warm start (incremental/streaming refinement): carry over known
        # rows, keep random init for rows beyond x0
        k = min(len(x0), n_points)
        x[:k] = np.asarray(x0, dtype=np.float64)[:k, :dim]
    # Uniform-weight blocks (from_points / streaming): V is fully
    # structured, so the CG multiply collapses to v_multiply_uniform —
    # skip building AND broadcasting v entirely (zero CG barriers).
    if uniform_weights and sammon_factor is None:
        uniform_n: int | None = n_points
        v_bc = None
    else:
        uniform_n = None
        v = v_array(blocks, wt)
        # v never changes across the anneal — one broadcast serves every CG
        # iteration of every stress loop (was: one broadcast per V×p multiply).
        v_bc = blocks.sparkSession.sparkContext.broadcast(v)

    total_stress_iters = 0
    temp_loops = 0
    # Fused kernel: the initial stress evaluation shares its distance pass
    # with the first iteration's BofZ (same X, same t); within a temp loop
    # each end-of-iteration stress is fused with the NEXT iteration's BofZ.
    # One barrier per SMACOF iteration instead of two, and the dominant
    # O(rows·N) distance computation runs once instead of twice — float
    # semantics identical to the unfused kernels (see stress_bofz).
    # try/finally: an exception inside any kernel must not leak the
    # anneal-lifetime v broadcast (and its executor blocks) — ADVICE r2
    try:
        sig, pending_bc = stress_bofz(blocks, x, t_cur, inv_sum_dsq, wt)
        while True:
            for _ in range(max_stress_loops):
                bc = pending_bc if pending_bc is not None else bofz_bc(blocks, x, t_cur, wt)
                pending_bc = None
                x, _ = cg_solve(
                    blocks, v_bc, bc, x, cg_iters, cg_threshold, wt, uniform_n=uniform_n
                )
                new_sig, pending_bc = stress_bofz(blocks, x, t_cur, inv_sum_dsq, wt)
                total_stress_iters += 1
                if sig > 0 and abs(sig - new_sig) / max(new_sig, 1e-30) < stress_threshold:
                    sig = new_sig
                    break
                sig = new_sig
            temp_loops += 1
            if t_cur == 0.0 or temp_loops >= max_temp_loops:
                break
            t_cur *= alpha
            if t_cur < t_min:
                t_cur = 0.0
            pending_bc = None  # t changed → the speculative BofZ is stale
    finally:
        if v_bc is not None:
            v_bc.destroy()
    return DamdsResult(points=x, stress=sig, temp_loops=temp_loops, stress_iters=total_stress_iters)


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the RDD blocks behind a ``localCheckpoint``'ed DataFrame NOW.

    ``Dataset.unpersist()`` is a no-op for checkpoint RDDs (they are not in
    the CacheManager), so without this the blocks linger until the
    ContextCleaner garbage-collects the old Dataset — unbounded growth for
    per-micro-batch checkpoints (ADVICE r2). The analyzed plan of a
    localCheckpoint'ed Dataset is a LogicalRDD wrapping the persisted RDD;
    unpersisting THAT RDD frees the storage immediately.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # not a checkpoint scan (plan shape changed): nothing to free


def quantize_distances(dist: np.ndarray) -> tuple[np.ndarray, float]:
    """Normalize to [0,1] by max and quantize to int16 (F12 encode).

    Returns (int16 matrix, scale) with scale = original max.
    """
    mx = float(dist.max())
    q = np.round(dist / mx * 32767.0).astype(np.int16) if mx > 0 else dist.astype(np.int16)
    return q, mx


def damds_blocks_from_files(
    spark: SparkSession,
    dist_path: str,
    n_points: int,
    weight_path: str | None = None,
    byteorder: str = "big",
    n_blocks: int = 32,
) -> DataFrame:
    """Build the damds block table straight from headerless int16 files —
    the 100 TB construction path (no driver materialization).

    Each task reads ONLY its row-range's bytes from the distance file and,
    when given, the matching range of the weight file — the shuffle-free
    distance/weight pairing the reference does by re-reading side files per
    block (damds/Distances.java:71-106, SURVEY S8/J3). The driver holds
    just the block manifest.
    """
    import os

    from flink_mm_spark.sources.binary_matrix import _np_dtype

    dt = _np_dtype("int16", byteorder)
    expect = n_points * n_points * dt.itemsize
    for pth in [dist_path] + ([weight_path] if weight_path else []):
        actual = os.path.getsize(pth)
        if actual < expect:
            raise ValueError(f"{pth}: {actual} bytes < expected {expect}")
    specs = pd.DataFrame(
        split_rows(n_points, n_blocks), columns=["block_id", "start", "block_rows"]
    )
    spec_df = spark.createDataFrame(specs).repartition(len(specs), "block_id")

    def load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                start, nrows = int(r["start"]), int(r["block_rows"])
                count = nrows * n_points
                offset = start * n_points * dt.itemsize
                d = np.fromfile(dist_path, dtype=dt, count=count, offset=offset).astype(np.int16)
                w = (
                    np.fromfile(weight_path, dtype=dt, count=count, offset=offset).astype(np.int16)
                    if weight_path is not None
                    else None
                )
                yield pd.DataFrame(
                    {
                        "block_id": [int(r["block_id"])],
                        "start": [start],
                        "block_rows": [nrows],
                        "n_points": [n_points],
                        "dist": [d],
                        "weight": [w],
                    }
                )

    return spec_df.mapInPandas(load, DAMDS_BLOCK_SCHEMA).persist(StorageLevel.MEMORY_AND_DISK)


def damds_blocks_from_points(
    spark: SparkSession,
    points: DataFrame,
    n_points: int,
    id_col: str = "point_id",
    vec_col: str = "vec",
    n_blocks: int = 16,
) -> DataFrame:
    """Build the quantized distance-block table from a points DataFrame via a
    DISTRIBUTED pairwise kernel — the O(N²) matrix never exists on the driver
    (VERDICT r1 "What's wrong" #3; contrast ``damds_blocks``).

    Shape: points pack into row-aligned blocks (same ``split_rows`` ranges as
    every other constructor) with ONE O(N·d) shuffle; the packed points
    matrix — O(N·d), the same order of data the anneal broadcasts every
    iteration as X — is gathered ordered and broadcast once; each row block
    then computes its full (block_rows × N) distance stripe IN PLACE with
    one numpy GEMM, so the O(N²) data is born in its final row-block home
    and never shuffles, spills, or persists in float form. Two narrow
    passes over the persisted pack: pass 1 reduces per-stripe maxima to the
    reference's quantization scale (damds/DAMDSUtils.java:8-9 semantics via
    ``quantize_distances``), pass 2 re-runs the identical GEMM and emits the
    int16 blocks. Recomputing the GEMM is deliberate: at d ≤ a few hundred
    it is far cheaper than persisting N²×8 bytes between passes. Driver
    memory: the N×d matrix and one scalar. ``points[id_col]`` must be
    exactly 0..n_points-1 (row index).
    """
    specs = split_rows(n_points, n_blocks)
    manifest = {b: (start, nrows) for b, start, nrows in specs}
    q, r = divmod(n_points, n_blocks)
    boundary = r * (q + 1)
    pid = F.col(id_col).cast("long")
    blk = (
        F.when(pid < boundary, (pid / (q + 1)).cast("int"))
        .otherwise((F.lit(r) + (pid - boundary) / max(q, 1)).cast("int"))
        if q > 0
        else pid.cast("int")
    )
    pts = points.select(pid.alias("pid"), F.col(vec_col).alias("vec"), blk.alias("blk"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pid")  # block rows ordered by global row index
        m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"blk": [int(pdf["blk"].iloc[0])], "mat": [m.ravel()]})

    packed = (
        pts.groupBy("blk")
        .applyInPandas(pack, "blk int, mat array<double>")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # O(N·d) ordered gather + broadcast (NOT O(N²)): the same data volume the
    # anneal ships every iteration as the X broadcast / gathers.
    prows = sorted(packed.collect(), key=lambda r: r["blk"])
    pmat = np.vstack(
        [
            np.asarray(r["mat"], dtype=np.float64).reshape(manifest[r["blk"]][1], -1)
            for r in prows
        ]
    )
    bc = spark.sparkContext.broadcast(pmat)

    def stripes(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[tuple[int, int, int, np.ndarray]]:
        pv = bc.value
        sq = (pv * pv).sum(1)
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                b = int(row.blk)
                start, nrows = manifest[b]
                ra = np.asarray(row.mat, dtype=np.float64).reshape(nrows, -1)
                d2 = sq[start : start + nrows][:, None] - 2.0 * (ra @ pv.T) + sq[None, :]
                yield b, start, nrows, np.sqrt(np.maximum(d2, 0.0))

    def stripe_max(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _b, _s, _n, d in stripes(batches):
            yield pd.DataFrame({"cmax": [float(d.max()) if d.size else 0.0]})

    gmax = (
        packed.mapInPandas(stripe_max, "cmax double").agg(F.max("cmax")).collect()[0][0]
        or 0.0
    )

    def stripe_quant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b, start, nrows, d in stripes(batches):
            # identical arithmetic to quantize_distances (d / max * 32767)
            q = (
                np.round(d / gmax * 32767.0).astype(np.int16)
                if gmax > 0
                else d.astype(np.int16)
            )
            yield pd.DataFrame(
                {
                    "block_id": [b],
                    "start": [start],
                    "block_rows": [nrows],
                    "n_points": [n_points],
                    "dist": [q.ravel()],
                    "weight": [None],
                }
            )

    blocks = packed.mapInPandas(stripe_quant, DAMDS_BLOCK_SCHEMA).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    blocks.count()  # materialize before releasing the packed points
    packed.unpersist()
    bc.unpersist()  # executors re-fetch from the driver copy if ever recomputed
    return blocks


# --- incremental distance-block state (streaming MDS) ----------------------

PACKED_POINTS_SCHEMA = "blk int, start long, nrows int, mat array<double>"


class IncrementalDistanceBlocks:
    """Distributed incremental N×N quantized distance matrix.

    The streaming counterpart of ``damds_blocks_from_points`` (VERDICT r2
    ask #4): instead of rebuilding all O(N²) cells per micro-batch,
    ``append`` extends the existing state with the b new points' stripes
    only — steady-state distance work is O(N·b):

    - every EXISTING row block gains b new columns via a narrow
      ``mapInPandas`` over the checkpointed blocks (the block's own row
      vectors come from the O(N·d) corpus broadcast that the append needs
      anyway, so no join and no shuffle ever touches the O(N²) arrays);
    - the new rows become fresh row blocks (ids append after all previous
      rows, so block_id order stays start order — the invariant every
      ordered gather relies on), computed against the same broadcast.

    Quantization-scale changes (damds/DAMDSUtils.java:8-9 semantics: cells
    store d/max·32767): the new cells' max is measured first; if it exceeds
    the current scale every stored cell is stale, so the state REBUILDS
    from the packed vectors — bitwise identical to a from-scratch
    construction because scale = global max either way. On real corpora
    the max stabilizes after the first batches, so steady state takes the
    O(N·b) append path (``last_mode`` exposes which path ran; the
    equality-vs-from-scratch property is pinned in tests/test_damds.py).

    State (``packed`` vectors + ``blocks``) lives distributed and is
    localCheckpoint'ed per batch to truncate lineage; the previous
    generation's checkpoint RDDs are freed eagerly via
    ``free_local_checkpoint`` (ADVICE r2: plain unpersist is a no-op for
    checkpoint RDDs). The driver transiently holds the O(N·d) packed
    matrix during the broadcast — the same order of data the anneal ships
    every iteration — never the O(N²) matrix.
    """

    def __init__(self, spark: SparkSession, n_blocks_hint: int = 8):
        self.spark = spark
        self.n_blocks_hint = n_blocks_hint
        self.packed: DataFrame | None = None
        self.blocks: DataFrame | None = None
        self.scale = 0.0
        self.n = 0
        self.n_blk = 0
        self.last_mode: str | None = None

    def _pack(self, ids_df: DataFrame, start: int, n_rows: int, n_sub: int) -> DataFrame:
        """Pack (point_id, vec) rows with contiguous ids [start, start+n_rows)
        into row-aligned (blk, start, nrows, mat) blocks, blk starting at
        ``self.n_blk`` in row order."""
        base_blk = self.n_blk
        q, r = divmod(n_rows, n_sub)
        boundary = r * (q + 1)
        rel = F.col("point_id").cast("long") - F.lit(start)
        sub = (
            F.when(rel < boundary, (rel / (q + 1)).cast("int"))
            .otherwise((F.lit(r) + (rel - boundary) / max(q, 1)).cast("int"))
            if q > 0
            else rel.cast("int")
        )
        pts = ids_df.select(
            F.col("point_id").cast("long").alias("pid"),
            F.col("vec").alias("vec"),
            (sub + F.lit(base_blk)).alias("blk"),
        )
        starts = {
            base_blk + b: (start + s, nr) for b, s, nr in split_rows(n_rows, n_sub)
        }

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("pid")
            blk = int(pdf["blk"].iloc[0])
            s, nr = starts[blk]
            m = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            assert len(m) == nr and int(pdf["pid"].iloc[0]) == s
            return pd.DataFrame(
                {"blk": [blk], "start": [s], "nrows": [nr], "mat": [m.ravel()]}
            )

        return pts.groupBy("blk").applyInPandas(pack, PACKED_POINTS_SCHEMA)

    def _gather_pmat(self, extra: DataFrame | None) -> np.ndarray:
        srcs = [s for s in (self.packed, extra) if s is not None]
        rows = []
        for s in srcs:
            rows.extend(s.select("start", "nrows", "mat").collect())
        rows.sort(key=lambda r: r["start"])
        return np.vstack(
            [np.asarray(r["mat"], dtype=np.float64).reshape(r["nrows"], -1) for r in rows]
        )

    @staticmethod
    def _stripes(batches: Iterator[pd.DataFrame], pv: np.ndarray, sq: np.ndarray):
        """(blk, start, nrows, float distance stripe) per packed block —
        the identical arithmetic of damds_blocks_from_points.stripes."""
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                start, nrows = int(row.start), int(row.nrows)
                ra = np.asarray(row.mat, dtype=np.float64).reshape(nrows, -1)
                d2 = sq[start : start + nrows][:, None] - 2.0 * (ra @ pv.T) + sq[None, :]
                yield int(row.blk), start, nrows, np.sqrt(np.maximum(d2, 0.0))

    def append(self, ids_df: DataFrame, b: int) -> None:
        """Absorb b new points (point_id = n .. n+b-1) into the state."""
        spark = self.spark
        n_old, n_new = self.n, self.n + b
        n_sub = max(1, min(self.n_blocks_hint, b // 16))
        new_packed = self._pack(ids_df, n_old, b, n_sub).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # the gather below is new_packed's first action → materializes the
        # persist (no separate count() job needed)
        pmat = self._gather_pmat(new_packed)  # O(N·d) transient gather
        bc = spark.sparkContext.broadcast(pmat)
        stripes = self._stripes

        def new_stripe_max(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pv = bc.value
            sq = (pv * pv).sum(1)
            for _b, _s, _n, d in stripes(batches, pv, sq):
                yield pd.DataFrame({"cmax": [float(d.max()) if d.size else 0.0]})

        # the new rows' stripes contain every new cell (new×all; old×new is
        # its transpose), so their max decides whether the scale grows
        gmax_new = (
            new_packed.mapInPandas(new_stripe_max, "cmax double")
            .agg(F.max("cmax"))
            .collect()[0][0]
            or 0.0
        )
        scale = max(self.scale, float(gmax_new))

        def quant_stripes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pv = bc.value
            sq = (pv * pv).sum(1)
            for blk, start, nrows, d in stripes(batches, pv, sq):
                q = (
                    np.round(d / scale * 32767.0).astype(np.int16)
                    if scale > 0
                    else d.astype(np.int16)
                )
                yield pd.DataFrame(
                    {
                        "block_id": [blk],
                        "start": [start],
                        "block_rows": [nrows],
                        "n_points": [n_new],
                        "dist": [q.ravel()],
                        "weight": [None],
                    }
                )

        # scale == 0 (all-identical corpus so far) also rebuilds: the append
        # quantizer divides by scale, and the degenerate state is all-zero
        # cells anyway
        rebuild = self.blocks is None or scale > self.scale or scale <= 0.0
        if rebuild:
            packed_all = (
                new_packed
                if self.packed is None
                else self.packed.unionByName(new_packed)
            )
            blocks_new = packed_all.mapInPandas(quant_stripes, DAMDS_BLOCK_SCHEMA)
            self.last_mode = "rebuild"
        else:

            def extend(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                pv = bc.value
                newv = pv[n_old:]
                new_sq = (newv * newv).sum(1)
                sq = (pv * pv).sum(1)  # once per task, not per block row
                for pdf in batches:
                    for row in pdf.itertuples(index=False):
                        start, nrows = int(row.start), int(row.block_rows)
                        ra = pv[start : start + nrows]
                        d2 = (
                            sq[start : start + nrows][:, None]
                            - 2.0 * (ra @ newv.T)
                            + new_sq[None, :]
                        )
                        d = np.sqrt(np.maximum(d2, 0.0))
                        q_app = np.round(d / scale * 32767.0).astype(np.int16)
                        old = np.asarray(row.dist, dtype=np.int16).reshape(nrows, n_old)
                        yield pd.DataFrame(
                            {
                                "block_id": [int(row.block_id)],
                                "start": [start],
                                "block_rows": [nrows],
                                "n_points": [n_new],
                                "dist": [np.hstack([old, q_app]).ravel()],
                                "weight": [None],
                            }
                        )

            extended = self.blocks.mapInPandas(extend, DAMDS_BLOCK_SCHEMA)
            fresh = new_packed.mapInPandas(quant_stripes, DAMDS_BLOCK_SCHEMA)
            blocks_new = extended.unionByName(fresh)
            self.last_mode = "append"

        # bound the partition count before checkpointing: each generation's
        # union would otherwise ADD the new mapInPandas output partitions
        # (mostly empty) and every later pass would pay a Python-worker task
        # per empty partition — measured 3× slower appends by generation 3.
        # coalesce is narrow: no shuffle ever touches the O(N²) arrays.
        cap = max(1, spark.sparkContext.defaultParallelism)
        blocks_ck = blocks_new.coalesce(cap).localCheckpoint(eager=True)
        packed_new = (
            new_packed if self.packed is None else self.packed.unionByName(new_packed)
        )
        packed_ck = packed_new.coalesce(cap).localCheckpoint(eager=True)
        # free the previous generation NOW (unpersist on a checkpointed
        # Dataset is a no-op — see free_local_checkpoint)
        if self.blocks is not None:
            free_local_checkpoint(self.blocks)
        if self.packed is not None:
            free_local_checkpoint(self.packed)
        new_packed.unpersist()
        bc.destroy()  # both checkpoints are materialized; nothing recomputes
        self.blocks = blocks_ck
        self.packed = packed_ck
        self.scale = scale
        self.n = n_new
        self.n_blk += n_sub
