"""Dedicated per-entry timing (median of N reps, noop-sink forced) for the
r14 optimization round's before/after evidence — same methodology as
bench.py's timed_median but isolated to the named entries so a change can
be measured without a full suite run (guide §1.1/§1.4).

Usage: python scripts/time_entries.py <name> [<name> ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_REPS (default 3).
Special names: kmeans_d2_k100_i10 / kmeans_d2_k1000_i10 run the bench.py
harness functions (they are not registry entries).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def main() -> None:
    names = sys.argv[1:]
    from flink_mm_spark import registry
    from flink_mm_spark.session import get_spark

    registry.load_all()
    spark = get_spark("r14-time-entries")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # same warmups as bench.py (JIT + python workers), untimed
    force(registry.QUERIES["top_orders_by_price"].fn(spark, SF_DIR))

    def _noop(it):
        for b in it:
            yield b

    ncpu = spark.sparkContext.defaultParallelism
    force(spark.range(0, ncpu, 1, ncpu).mapInPandas(_noop, "id long"))

    import bench

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        if name == "kmeans_d2_k100_i10":
            fn = lambda: bench.bench_kmeans(spark, SF_DIR)  # noqa: E731
        elif name == "kmeans_d2_k1000_i10":
            fn = lambda: bench.bench_kmeans_k1000(spark, SF_DIR)  # noqa: E731
        else:
            fn = lambda name=name: force(registry.QUERIES[name].fn(spark, SF_DIR))  # noqa: E731
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"median": round(statistics.median(runs), 3), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "load": list(os.getloadavg()), "entries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
