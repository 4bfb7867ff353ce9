"""sf0.01 → sf0.1 growth ladders (VERDICT r13 #5): medians of 3 warm
same-session runs per entry at BOTH scales, in one session, printed as a
JSON line per entry. Core-count ratios cannot certify parallelism at
these SFs (availableNow/job floors dominate), so data-growth ratios are
the load-independent scale evidence SCALE.md records.

Usage: python scripts/growth_ladder.py <name> [<name> ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from flink_mm_spark import registry
    from flink_mm_spark.session import get_spark

    registry.load_all()
    spark = get_spark("r14-growth-ladder")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def _noop(it):
        for b in it:
            yield b

    ncpu = spark.sparkContext.defaultParallelism
    force(spark.range(0, ncpu, 1, ncpu).mapInPandas(_noop, "id long"))

    for name in names:
        out = {"entry": name, "load0": round(os.getloadavg()[0], 1)}
        for sf in SFS:
            runs = []
            for _ in range(REPS):
                spark.sparkContext.setJobDescription(f"ladder {name} {sf}")
                t0 = time.perf_counter()
                force(registry.QUERIES[name].fn(spark, sf))
                runs.append(round(time.perf_counter() - t0, 3))
            out[sf.rsplit("/", 1)[-1]] = {
                "median": round(statistics.median(runs), 3),
                "runs": runs,
            }
        a = out["sf0.01"]["median"]
        b = out["sf0.1"]["median"]
        out["growth_10x"] = round(b / a, 2) if a else None
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
