"""Unigram-LM tokenizer contracts (operators/tokenizer.py, r5).

Float EM is not SQL-replayable, so these tests carry the correctness
burden the DuckDB oracle carries for BPE: segmentation validity, hard-EM
loss monotonicity, character coverage, vocabulary sizing, determinism,
and encode consistency.
"""

from __future__ import annotations

import numpy as np

from flink_mm_spark.operators import tokenizer as tk
from flink_mm_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _words(spark):
    return tk._unigram_words(spark, SF_DIR)


def test_viterbi_segmentation_concatenates():
    logp = {"a": -1.0, "b": -1.2, "ab": -1.5, "ba": -1.4, "abb": -2.0}
    for w in ("abba", "ab", "bbbb", "a", "abab"):
        pieces, score = tk._viterbi(w, logp, 3)
        assert "".join(pieces) == w
        assert score > float("-inf")


def test_viterbi_prefers_higher_likelihood():
    # one cheap long piece beats two chars when its logp is greater
    logp = {"a": -3.0, "b": -3.0, "ab": -1.0}
    pieces, _ = tk._viterbi("ab", logp, 2)
    assert pieces == ["ab"]
    # and ties resolve to the longest final piece (deterministic)
    logp = {"a": -1.0, "aa": -2.0}
    pieces, _ = tk._viterbi("aa", logp, 2)
    assert pieces == ["aa"]


def test_train_unigram_contracts(spark):
    rows, losses = tk.train_unigram(_words(spark))
    pieces = {p for p, _c, _lp in rows}
    words = {r["w"] for r in _words(spark).collect()}
    chars = {ch for w in words for ch in w}
    # every character survives pruning → every word stays segmentable
    assert chars <= pieces
    # vocabulary pruned to (or under) the target size
    assert len(pieces) <= max(tk.UNI_VOCAB_SIZE, len(chars))
    # hard-EM: best-segmentation NLL is non-increasing across the
    # pre-prune iterations (0.1% slack for the char-floor smoothing)
    for a, b in zip(losses[: tk.UNI_EM_ITERS - 1], losses[1 : tk.UNI_EM_ITERS]):
        assert b <= a * 1.001, losses
    # log-probs normalized-ish: all negative, finite
    assert all(lp < 0 and np.isfinite(lp) for _p, _c, lp in rows)
    # every word segments under the final table
    logp = {p: lp for p, _c, lp in rows}
    for w in words:
        seg, score = tk._viterbi(w, logp, tk.UNI_MAX_PIECE_LEN)
        assert "".join(seg) == w and score > float("-inf"), w


def test_train_unigram_deterministic(spark):
    a = tk.train_unigram(_words(spark))
    b = tk.train_unigram(_words(spark))
    assert a == b


def test_unigram_encode_consistency(spark):
    enc = {r["doc_id"]: r for r in QUERIES["unigram_encode"].fn(spark, SF_DIR).collect()}
    assert enc
    for doc_id, r in enc.items():
        assert r["n_words"] >= 1
        # each word is at least one piece, at most its character count
        assert r["n_unigram_pieces"] >= r["n_words"]
        assert 1.0 <= r["pieces_per_word"] <= tk.UNI_MAX_PIECE_LEN * 4
    # pieces table runs and is non-trivial
    pt = QUERIES["unigram_pieces"].fn(spark, SF_DIR).collect()
    assert len(pt) >= 2
    assert any(len(r["piece"]) > 1 for r in pt)  # learned multi-char pieces
