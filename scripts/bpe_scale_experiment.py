"""BPE trainer scale experiment (r5, VERDICT r4 ask #3).

Measures the two vocab-scale training tiers on a synthetic 300k-distinct-word
Zipf vocabulary (the testdata corpus has a ~31-token vocabulary — far too
small to support a real merge budget):

- DRIVER-LOCAL incremental-heap trainer at a real 30k-merge budget
  (the production path: any collectable vocabulary);
- DISTRIBUTED batched-exact loop at a smaller budget, recording
  driver-round amortization (merges per round) and per-round latency —
  the tier for vocabularies that cannot sit on the driver.

Also cross-checks the first merges of both tiers agree.

Usage: python scripts/bpe_scale_experiment.py [--merges 30000]
Prints one JSON line per measurement and a markdown row on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flink_mm_spark.operators import tokenizer as tk
from flink_mm_spark.session import get_spark

N_WORDS = 400_000  # pre-dedup draws; ~300k distinct
ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def synth_vocab(seed: int = 123) -> list[tuple]:
    rng = np.random.RandomState(seed)
    words: dict[str, int] = {}
    lens = rng.randint(3, 13, size=N_WORDS)
    ranks = np.arange(1, N_WORDS + 1)
    freqs = 1 + (50_000 // ranks)  # Zipf-ish head
    for ln, f in zip(lens, freqs):
        w = "".join(rng.choice(list(ALPHABET), size=ln))
        words[w] = words.get(w, 0) + int(f)
    return list(words.items())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=30_000)
    ap.add_argument("--dist-merges", type=int, default=64)
    args = ap.parse_args()

    items = synth_vocab()
    print(f"synthetic vocab: {len(items)} distinct words", file=sys.stderr)

    t = time.time()
    local = tk._train_merges_local(items, args.merges)
    local_wall = time.time() - t
    print(
        json.dumps(
            {
                "tier": "local",
                "vocab": len(items),
                "merges": len(local),
                "wall_sec": round(local_wall, 2),
                "merges_per_sec": round(len(local) / local_wall, 1),
            }
        )
    )

    spark = get_spark("bpe-scale")
    df = spark.createDataFrame(items, "w string, freq bigint").repartition(32)
    rounds = []
    orig = tk._disjoint_prefix  # called exactly once per driver round

    def spy(rows, cap):
        rounds.append(1)
        return orig(rows, cap)

    tk._disjoint_prefix = spy
    saved = tk.BPE_LOCAL_MAX_VOCAB
    tk.BPE_LOCAL_MAX_VOCAB = 0
    try:
        t = time.time()
        dist = tk._train_merges_from_words(df, args.dist_merges)
        dist_wall = time.time() - t
    finally:
        tk.BPE_LOCAL_MAX_VOCAB = saved
        tk._disjoint_prefix = orig
    n_rounds = max(len(rounds), 1)
    print(
        json.dumps(
            {
                "tier": "distributed-batched",
                "vocab": len(items),
                "merges": len(dist),
                "driver_rounds": n_rounds,
                "merges_per_round": round(len(dist) / n_rounds, 2),
                "wall_sec": round(dist_wall, 2),
                "sec_per_round": round(dist_wall / n_rounds, 2),
            }
        )
    )

    agree = local[: len(dist)] == dist
    print(json.dumps({"tiers_agree_on_prefix": agree, "prefix": len(dist)}))
    if not agree:
        raise SystemExit("tier disagreement — trainer bug")
    print(
        f"| bpe train | local 30k merges {local_wall:.1f}s "
        f"({len(local)/local_wall:.0f}/s); distributed {len(dist)} merges in "
        f"{n_rounds} rounds ({len(dist)/n_rounds:.1f}/round, "
        f"{dist_wall/n_rounds:.1f}s/round) |",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
