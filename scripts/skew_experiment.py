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


if __name__ == "__main__":
    main()
