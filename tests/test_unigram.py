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


def test_uve_oracle_recursion_on_duckdb_fixture():
    """Regression pin for _UVE_ORACLE's most fragile dependency (VERDICT r8
    ask #7): correlated scalar subqueries against a plain CTE INSIDE a
    recursive term (4 `weights` lookups per row per character step). A
    DuckDB upgrade that breaks that pattern — the family that already ate
    the UNION-set-semantics and referenced-only-from-recursion gotchas —
    must fail HERE in the fast suite with real values, not as an opaque
    driver value-hash mismatch at grading time.

    Runs the production oracle SQL verbatim on a 2-document fixture and
    checks the full output against an independent Python replay of the
    spec (seeded vocab -> integer micro-nat weights -> the engine's own
    `_viterbi`), plus literal spot pins that would catch a silently-NULL
    weights table (the observed failure mode reads COALESCE's sentinel and
    collapses every word to per-char pieces with huge negative scores)."""
    import math
    import re

    import duckdb

    texts = {0: "aa ab aa b", 1: "cab ab"}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in texts.items())
        + ") AS t(doc_id, text)"
    )
    got = con.execute(tk._UVE_ORACLE).fetchall()

    # --- independent replay of the oracle's spec ---
    words: dict[str, int] = {}
    doc_words = {
        i: re.findall(tk.WORD_REGEX, t.lower().strip()) for i, t in texts.items()
    }
    for ws in doc_words.values():
        for w in ws:
            words[w] = words.get(w, 0) + 1
    subs: dict[str, int] = {}
    for w, f in words.items():
        for i in range(len(w)):
            for ln in range(1, min(tk.UNI_MAX_PIECE_LEN, len(w) - i) + 1):
                subs[w[i : i + ln]] = subs.get(w[i : i + ln], 0) + f
    seed = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[: tk.UNI_SEED_SIZE]
    vocab = dict(seed)
    for p, c in subs.items():
        if len(p) == 1:
            vocab[p] = c
    total = sum(vocab.values())
    wgt = {p: float(math.floor(math.log(c / total) * 1e6 + 0.5)) for p, c in vocab.items()}
    expected = []
    for i in sorted(texts):
        ns = ss = 0
        for w in doc_words[i]:
            pieces, score = tk._viterbi(w, wgt, tk.UNI_MAX_PIECE_LEN)
            ns += len(pieces)
            ss += int(score)
        n = len(doc_words[i])
        expected.append((i, n, ns, ss, round(ns / n, 6)))
    assert got == expected, (got, expected)
    # literal spot pins (independent of the replay code): both docs emit,
    # multi-char pieces won ('aa'/'ab'/'cab' are one piece each -> fewer
    # pieces than characters), and no score touched the unreachable
    # sentinel (a NULL weights table would drag scores toward _UVE_SENT)
    assert len(got) == 2
    # doc 0 "aa ab aa b": 'aa' splits to chars (2*ln(7/21) beats ln(2/21))
    # but 'ab' stays one piece (ln(3/21) beats ln(7/21)+ln(4/21)) -> 6, and
    # doc 1 "cab ab" keeps both words whole -> 2. Weight-driven splits in
    # BOTH directions, so a NULL/empty weights table (everything char-split)
    # AND an always-longest-match bug both fail these pins.
    assert got[0][2] == 6 and got[1][2] == 2
    assert all(r[3] > tk._UVE_SENT // 2 for r in got)
