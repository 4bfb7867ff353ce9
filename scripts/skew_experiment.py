"""Measured hot-key experiment: naive inverted-index Jaccard join vs
PPJoin prefix filtering on a Zipfian corpus (VERDICT r1 item 7).

The testdata corpus has a ~31-token vocabulary (no rare tokens), so local
timings can't show the skew. This script synthesizes a corpus with a real
Zipfian vocabulary and counts CANDIDATE PAIRS per join key — the quantity
that actually hits the shuffle — for both candidate-generation schemes.
Counts, not wall-clock: this box's timings vary ~2x with load
(BASELINE.md), while pair counts are exact and machine-independent.

Run: python scripts/skew_experiment.py  (numpy only, a few seconds)
"""

from __future__ import annotations

import math

import numpy as np

N_DOCS = 10_000
DOC_LEN = 40
VOCAB = 50_000
ZIPF_S = 1.1
T = 0.7  # Jaccard threshold (the registered queries' value)


def main() -> None:
    rng = np.random.RandomState(42)
    # Zipfian token draws, truncated to the vocab
    docs = []
    for _ in range(N_DOCS):
        toks = rng.zipf(ZIPF_S, DOC_LEN * 2) - 1
        toks = np.unique(toks[toks < VOCAB])[:DOC_LEN]
        docs.append(toks)

    # global document frequency
    df = np.zeros(VOCAB, dtype=np.int64)
    for toks in docs:
        df[toks] += 1

    # naive: every posting joins — candidates = sum_t C(df_t, 2)
    naive = int((df.astype(object) * (df - 1) // 2).sum())
    hottest = int(df.max())

    # prefix-filtered: only the (n - ceil(t*n) + 1) globally-rarest tokens
    # of each doc post; rarity = ascending df (ties by token id)
    rank_key = df.astype(np.float64) * VOCAB + np.arange(VOCAB)
    pdf = np.zeros(VOCAB, dtype=np.int64)
    for toks in docs:
        n = len(toks)
        plen = n - math.ceil(T * n) + 1
        prefix = toks[np.argsort(rank_key[toks], kind="stable")[:plen]]
        pdf[prefix] += 1
    filtered = int((pdf.astype(object) * (pdf - 1) // 2).sum())
    hottest_f = int(pdf.max())

    print(f"docs={N_DOCS} vocab={VOCAB} zipf_s={ZIPF_S} t={T}")
    print(f"naive:  candidate pairs = {naive:,}  hottest-key df = {hottest:,}")
    print(f"prefix: candidate pairs = {filtered:,}  hottest-key df = {hottest_f:,}")
    print(f"reduction = {naive / max(filtered, 1):,.0f}x")


def spark_skew_split() -> None:
    """AQE skew-join ON vs OFF on the naive posting self-join (VERDICT r2
    ask #7): a Zipfian corpus concentrates millions of candidate pairs on
    a handful of hot token keys — one straggler partition per hot key.
    With ``spark.sql.adaptive.skewJoin.enabled`` the hot partitions split
    at runtime (the plan's SortMergeJoin gains ``skew=true`` and the
    AQEShuffleRead fans the partition out); thresholds are lowered so the
    local-scale experiment crosses the same trigger a 256MB-partition
    would at 100 TB. Reports the skew markers, the join-side partition
    fan-out, and wall clock for both settings.
    """
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from flink_mm_spark.session import get_spark

    rng = np.random.RandomState(42)
    n_docs, doc_len = 3_000, 40
    rows = []
    for d in range(n_docs):
        toks = rng.zipf(ZIPF_S, doc_len * 2) - 1
        toks = np.unique(toks[toks < VOCAB])[:doc_len]
        rows.extend((d, int(t)) for t in toks)

    # 512 shuffle partitions thin the median partition so the hot token's
    # partition crosses the (scaled-down) skew trigger — the same RATIO a
    # 256MB-threshold cluster sees when one key holds GBs of postings.
    # Skew detection is on join-INPUT partition bytes: hot-key input rows
    # must dominate their hash partition, so the median has to be thin.
    spark = get_spark(
        "skew-experiment",
        shuffle_partitions=512,
        extra_conf={
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
            "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep the SMJ
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    posting = spark.createDataFrame(rows, "doc_id long, s long").persist()
    posting.count()
    import re

    for flag in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        a, b = posting.alias("a"), posting.alias("b")
        df = a.join(  # rebuilt per flag: a reused plan would reuse AQE decisions
            b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        ).groupBy().count()
        t0 = time.perf_counter()
        n = df.collect()[0][0]
        dt = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        skew_nodes = plan.count("skew=true")
        fanout = re.findall(r"AQEShuffleRead[^\n]*", plan)
        print(
            f"skewJoin={flag}: candidates={n:,} wall={dt:.1f}s "
            f"skew_marked_joins={skew_nodes} aqe_reads={[x[:80] for x in fanout]}"
        )
    posting.unpersist()
    spark.stop()


if __name__ == "__main__":
    import sys as _sys

    main()
    if "--spark" in _sys.argv:
        spark_skew_split()
