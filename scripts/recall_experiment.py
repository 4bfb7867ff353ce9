"""Clustered-embedding ANN recall experiment (VERDICT r6 ask #6 / r7 ask #8).

The testdata embeddings are RANDOM (near-orthogonal: max pairwise cosine
≈ 0.51 — see CLAUDE.md corpus quirks), which is the documented WORST CASE
for any ANN index: "neighbors" are arbitrary directions, so no bucketing
scheme carries signal and measured recall is a floor, not a typical value.
Real embedding corpora (sentence/document encoders) are clustered. This
harness synthesizes deterministic Gaussian-cluster corpora at two tightness
levels, writes them as ``embeddings.parquet`` under a temp dir so the
REGISTERED ANN queries run against them unchanged, and records:

- recall@3 vs exact brute-force cosine top-3 (numpy, driver oracle), for
  ``ann_lsh_topk`` (multi-probe hyperplane LSH), ``ivf_topk`` (trained
  coarse quantizer), and ``ivf_pq_topk`` (IVF + residual PQ);
- the candidate-pair budget each index scanned (LSH: exact, from the
  bucket histogram × the 9-cell probe fan-out; IVF/IVF-PQ: exact, by
  replaying the same deterministic quantizer training + assignment in
  numpy), as a fraction of the n² brute-force pair space.

Usage: python scripts/recall_experiment.py [--n 4000] [--clusters 32]
Prints one JSON line per (config, op) and a markdown table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from flink_mm_spark import registry
from flink_mm_spark.session import get_spark

registry.load_all()

from flink_mm_spark.operators.similarity import (  # noqa: E402
    EMB_DIM,
    IVF_TRAIN_MAX,
    N_LIST,
    N_PLANES,
    N_PROBE,
    _PLANES,
    _train_coarse_centroids,
)

ANN_OPS = ["ann_lsh_topk", "ivf_topk"]  # per-vector top-3 pair outputs
K = 3
# ivf_pq_topk is a different shape — ONE query (vec_id 0), top-PQ_TOPK by
# estimated residual-PQ distance — measured as recall@PQ_TOPK separately.


def _hash_uniform(k: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic U[0,1) from integer keys (the synth pattern used by
    scripts/scaleup_experiment.py — no RNG state, partition-invariant)."""
    return (((k * 2654435761) + salt) % (1 << 32)) / float(1 << 32)


def synth_clustered(spark, n_vecs: int, n_clusters: int, sigma: float, out_dir: str):
    """vec(id) = normalize(center(id % n_clusters) + sigma·noise(id)):
    unit-norm cluster centers in random directions, isotropic uniform
    noise — tight clusters at sigma=0.15, loose overlapping ones at 0.4."""
    dims = np.arange(EMB_DIM)[None, :]
    cent_keys = np.arange(n_clusters)[:, None] * EMB_DIM + dims
    centers = _hash_uniform(cent_keys, 12345) * 2.0 - 1.0
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            k = ids[:, None] * EMB_DIM + dims
            noise = _hash_uniform(k, 977) * 2.0 - 1.0
            v = centers[ids % n_clusters] + sigma * noise
            v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [row for row in v],
                    "label": (ids % n_clusters).astype(np.int32),
                }
            )

    (
        spark.range(n_vecs, numPartitions=32)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )


def _collect_matrix(spark, sf_dir: str):
    from flink_mm_spark.operators.similarity import embeddings64

    rows = embeddings64(spark, sf_dir).orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.vstack([r["emb"] for r in rows])
    return ids, m / np.linalg.norm(m, axis=1, keepdims=True)


def brute_topk(ids: np.ndarray, mn: np.ndarray, k: int = K) -> dict[int, set[int]]:
    c = mn @ mn.T
    np.fill_diagonal(c, -np.inf)
    return {
        int(ids[i]): {int(ids[j]) for j in np.argsort(-c[i])[:k]}
        for i in range(len(ids))
    }


def lsh_candidates(mn: np.ndarray) -> int:
    """Exact candidate-pair count of ann_lsh_topk's plan: every vector
    probes its own sign bucket plus the 8 one-bit flips; candidates =
    Σ_q Σ_{probed cells} |members(cell)| (self included, as in the plan)."""
    bits = (mn @ _PLANES.T) > 0
    buckets = bits @ (1 << np.arange(N_PLANES))
    hist = np.bincount(buckets, minlength=1 << N_PLANES)
    cand = 0
    for b in buckets:
        cells = [b] + [b ^ (1 << i) for i in range(N_PLANES)]
        cand += int(sum(hist[c] for c in cells))
    return cand


def ivf_replay(ids: np.ndarray, mn: np.ndarray):
    """Replay ivf_topk/ivf_pq_topk's coarse stage exactly (same
    deterministic training sample and k-means): returns (total candidate
    pairs across all queries, per-cell histogram, per-query probe cells)."""
    order = np.argsort(ids)
    sample = mn[order][:IVF_TRAIN_MAX]
    cents = _train_coarse_centroids(sample, N_LIST)
    d2 = (mn * mn).sum(1)[:, None] - 2.0 * (mn @ cents.T) + (cents * cents).sum(1)[None, :]
    cells = np.argmin(d2, axis=1)
    probes = np.argsort(d2, axis=1)[:, :N_PROBE]
    hist = np.bincount(cells, minlength=N_LIST)
    return int(hist[probes].sum()), hist, probes


def run_config(spark, tag: str, sf_dir: str, results: list) -> None:
    ids, mn = _collect_matrix(spark, sf_dir)
    n = len(ids)
    want = brute_topk(ids, mn)
    total = sum(len(v) for v in want.values())
    ivf_total, ivf_hist, ivf_probes = ivf_replay(ids, mn)
    budgets = {
        "ann_lsh_topk": lsh_candidates(mn),
        "ivf_topk": ivf_total,
    }
    for op in ANN_OPS:
        rows = registry.QUERIES[op].fn(spark, sf_dir).collect()
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["vec_a"], set()).add(r["vec_b"])
        hits = sum(len(want[v] & got.get(v, set())) for v in want)
        rec = round(hits / total, 4)
        row = {
            "config": tag,
            "op": op,
            "n": n,
            "recall": rec,
            "at_k": K,
            "candidate_pairs": budgets[op],
            "frac_of_brute_pairs": round(budgets[op] / (n * n), 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # ivf_pq_topk: ONE query (vec_id 0 by construction), top-PQ_TOPK by
    # estimated distance; recall vs the exact L2 top-PQ_TOPK (self incl.)
    from flink_mm_spark.operators.similarity import PQ_TOPK

    rows = registry.QUERIES["ivf_pq_topk"].fn(spark, sf_dir).collect()
    got0 = {r["vec_id"] for r in rows}
    i0 = int(np.where(ids == 0)[0][0])
    d = ((mn - mn[i0]) ** 2).sum(1)
    want0 = {int(ids[j]) for j in np.argsort(d, kind="stable")[:PQ_TOPK]}
    q0_budget = int(ivf_hist[ivf_probes[i0]].sum())
    row = {
        "config": tag,
        "op": "ivf_pq_topk",
        "n": n,
        "recall": round(len(got0 & want0) / PQ_TOPK, 4),
        "at_k": PQ_TOPK,
        "candidate_pairs": q0_budget,  # the single query's probed members
        "frac_of_brute_pairs": round(q0_budget / n, 4),
    }
    results.append(row)
    print(json.dumps(row), flush=True)
    spark.catalog.clearCache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--clusters", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("flink-mm-recall")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    results: list[dict] = []
    # worst-case baseline: the random near-orthogonal testdata
    run_config(spark, "random(sf0.01)", "/root/testdata/sf0.01", results)
    for sigma, tag in ((0.15, "tight(sigma=0.15)"), (0.4, "loose(sigma=0.4)")):
        d = tempfile.mkdtemp(prefix=f"recall_{tag.split('(')[0]}_")
        try:
            synth_clustered(spark, args.n, args.clusters, sigma, d)
            run_config(spark, tag, d, results)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print("\n| config | op | recall@k | k | candidate pairs | % of brute |", file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in results:
        print(
            f"| {r['config']} | {r['op']} | {r['recall']:.3f} | {r['at_k']} | "
            f"{r['candidate_pairs']:,} | {100 * r['frac_of_brute_pairs']:.1f}% |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
