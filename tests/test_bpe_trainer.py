"""BPE trainer equivalence (operators/tokenizer.py, r5 scale hardening).

Three trainers must produce bit-identical merge tables:

- ``sequential_bpe`` (this file): a pure-Python one-merge-per-round
  reference with exactly the DuckDB oracle's semantics (count →
  (cnt DESC, pair ASC) argmax → padded non-overlapping left-to-right
  replace);
- the DRIVER-LOCAL incremental-heap trainer (``_train_merges_local``),
  the production path for any collectable vocabulary;
- the DISTRIBUTED batched-exact loop (top-K collect → provably-sequential
  merge batches → chained replace → periodic localCheckpoint), the path
  for vocabularies too large to collect.

Vocabularies are engineered to hit the hazards the batch bound and the
greedy-left replace semantics create: overlapping symbols, re-mergeable
leftovers (``a b a b`` → ``ab a b`` keeps a live (a, b)), tie-broken
counts, repeated-character runs.
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_mm_spark.operators import tokenizer as tk


def sequential_bpe(words: dict[str, int], n_merges: int) -> list[tuple]:
    """Reference trainer: ONE merge per round, padded str.replace — the
    exact semantics of the DuckDB oracle's unrolled stages."""
    seqs = {w: " ".join(w) for w in words}
    out: list[tuple] = []
    for rnd in range(1, n_merges + 1):
        counts: dict[str, int] = {}
        for w, f in words.items():
            syms = seqs[w].split(" ")
            for i in range(len(syms) - 1):
                p = syms[i] + " " + syms[i + 1]
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        left, right = pair.split(" ")
        merged = left + right
        out.append((rnd, left, right, merged, cnt))
        for w in seqs:
            seqs[w] = (
                (" " + seqs[w] + " ")
                .replace(f" {pair} ", f" {merged} ")
                .strip()
            )
    return out


def _local(words: dict[str, int], n_merges: int) -> list[tuple]:
    return tk._train_merges_local(list(words.items()), n_merges)


def _distributed(spark, words: dict[str, int], n_merges: int, monkeypatch) -> list[tuple]:
    monkeypatch.setattr(tk, "BPE_LOCAL_MAX_VOCAB", 0)  # force the batched loop
    df = spark.createDataFrame(list(words.items()), "w string, freq bigint")
    return tk._train_merges_from_words(df, n_merges)


def _zipf_vocab(seed: int, n_words: int, alphabet: str) -> dict[str, int]:
    rng = np.random.RandomState(seed)
    words: dict[str, int] = {}
    for i in range(n_words):
        ln = int(rng.randint(2, 9))
        w = "".join(rng.choice(list(alphabet), size=ln))
        words[w] = words.get(w, 0) + int(1 + 1000 // (i + 1))
    return words


REPEATS_AND_TIES = {
    # repeated-character runs exercise greedy-left leftovers and the
    # separator-consuming skip ("a b a b" merges only its first pair per
    # round); equal counts exercise the pair-ASC tie-break
    "aaaa": 10,
    "aaab": 10,
    "abab": 10,
    "bbbb": 10,
    "abba": 7,
    "baab": 7,
    "aa": 3,
    "bb": 3,
}


def test_local_equals_sequential_zipf():
    words = _zipf_vocab(seed=7, n_words=60, alphabet="abcde")
    assert _local(words, 20) == sequential_bpe(words, 20)


def test_local_equals_sequential_repeats_and_ties():
    assert _local(REPEATS_AND_TIES, 12) == sequential_bpe(REPEATS_AND_TIES, 12)


def test_local_exhausts_cleanly():
    words = {"ab": 5, "ba": 3}
    got = _local(words, 50)
    assert got == sequential_bpe(words, 50)
    assert 0 < len(got) < 50


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_local_equals_sequential_random(seed):
    words = _zipf_vocab(seed=seed, n_words=45, alphabet="abc")
    assert _local(words, 25) == sequential_bpe(words, 25)


def test_distributed_equals_sequential_zipf(spark, monkeypatch):
    words = _zipf_vocab(seed=7, n_words=60, alphabet="abcde")
    assert _distributed(spark, words, 20, monkeypatch) == sequential_bpe(words, 20)


def test_distributed_equals_sequential_repeats_and_ties(spark, monkeypatch):
    assert _distributed(spark, REPEATS_AND_TIES, 12, monkeypatch) == sequential_bpe(
        REPEATS_AND_TIES, 12
    )


def test_distributed_tiny_topk_and_checkpoint(spark, monkeypatch):
    """Shrink the collected top-K so truncation is live, force a checkpoint
    every round, and cap batches at 2 — the batched trainer must STILL
    replay the sequential merge table exactly."""
    monkeypatch.setattr(tk, "BPE_TOPK", 5)
    monkeypatch.setattr(tk, "BPE_MAX_BATCH", 2)
    monkeypatch.setattr(tk, "BPE_CHECKPOINT_EVERY", 1)
    words = _zipf_vocab(seed=42, n_words=40, alphabet="abcd")
    assert _distributed(spark, words, 15, monkeypatch) == sequential_bpe(words, 15)


@pytest.mark.parametrize("seed", [2, 3])
def test_distributed_equals_sequential_random(spark, seed, monkeypatch):
    words = _zipf_vocab(seed=seed, n_words=35, alphabet="abc")
    assert _distributed(spark, words, 10, monkeypatch) == sequential_bpe(words, 10)


def test_local_tier_byte_cap(spark, monkeypatch):
    """A vocabulary tiny by COUNT but huge by word length must not take the
    driver-local collect (VERDICT r5 ask #6: a no-whitespace/binary-spill
    corpus blows per-word string sizes, not the distinct count). Shrink the
    char cap below the vocab's total length and verify the trainer falls
    back to the distributed tier — and stays merge-exact."""
    calls: list[int] = []
    real_local = tk._train_merges_local

    def spy(items, n_merges):
        calls.append(1)
        return real_local(items, n_merges)

    monkeypatch.setattr(tk, "_train_merges_local", spy)
    monkeypatch.setattr(tk, "BPE_LOCAL_MAX_CHARS", 64)
    words = {"abcd" * 40: 5, "bcda" * 40: 3, "ab": 9}  # 3 words, 322 chars
    df = spark.createDataFrame(list(words.items()), "w string, freq bigint")
    got = tk._train_merges_from_words(df, 8)
    assert not calls, "byte-capped vocab still took the driver-local tier"
    assert got == sequential_bpe(words, 8)
    # the same vocab under the default caps DOES train locally
    monkeypatch.setattr(tk, "BPE_LOCAL_MAX_CHARS", 256 * 1024 * 1024)
    assert tk._train_merges_from_words(df, 8) == got
    assert calls


def test_bpe_bytes_holdout_is_unk_free_with_unseen_octets(spark):
    """Byte-fallback contract of bpe_bytes_encode (r9): part names contain
    octets the documents corpus never produced ('x'/'z' are absent from its
    alphabet), yet EVERY holdout word encodes — unseen octets simply stay
    unmerged singles, where the char-level WordPiece holdout collapses the
    same words to [UNK]. Also pins that trained merges genuinely fire on
    the holdout (some parts compress) so the apply stages are not dead."""
    from pyspark.sql import functions as F

    import flink_mm_spark.operators.tokenizer as tk
    from flink_mm_spark.registry import QUERIES
    from flink_mm_spark.sources.tables import parallelize_scan, table
    from tests.conftest import SF_DIR

    docs = parallelize_scan(table(spark, SF_DIR, "documents"))
    corpus_octets = {
        r["o"]
        for r in docs.select(
            F.explode(
                F.regexp_extract_all(
                    tk._hex_word("text").substr(F.lit(1), F.length("text") * 2),
                    F.lit(".."),
                    0,
                )
            ).alias("o")
        )
        .distinct()
        .collect()
    }
    part_words = (
        table(spark, SF_DIR, "part")
        .select(F.explode(F.regexp_extract_all("p_name", F.lit(tk.WORD_REGEX), 0)).alias("w0"))
        .select(tk._hex_word("w0").alias("w"))
        .distinct()
        .collect()
    )
    part_octets = {
        w["w"][i : i + 2] for w in part_words for i in range(0, len(w["w"]), 2)
    }
    unseen = part_octets - corpus_octets
    assert unseen, "fixture drift: part names no longer carry unseen octets"
    assert {"78", "7A"} & unseen  # 'x' and/or 'z'

    rows = QUERIES["bpe_bytes_encode"].fn(spark, SF_DIR).collect()
    n_parts = table(spark, SF_DIR, "part").count()
    assert len(rows) == n_parts  # every part encoded — no UNK path exists
    for r in rows:
        assert r["n_words"] >= 1
        assert r["n_words"] <= r["n_byte_tokens"] <= r["n_bytes"]
    assert any(r["n_byte_tokens"] < r["n_bytes"] for r in rows)  # merges fired
