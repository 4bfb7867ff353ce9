"""Semantic invariants for the curation-filter family (operators/curation.py).

The oracle tests (test_queries.py) prove engine parity; these pin the
*meaning* of each metric — the properties a pipeline author relies on when
thresholding them.
"""

from __future__ import annotations

import numpy as np

from flink_mm_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _rows(spark, name):
    return registry.QUERIES[name].fn(spark, SF_DIR).collect()


def test_repetition_signals_fractions_bounded(spark):
    rows = _rows(spark, "repetition_signals")
    assert rows
    for r in rows:
        assert r["n_tokens"] > 0
        for c in ("dup_unigram_frac", "top_bigram_frac", "dup_trigram_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])
        # the modal bigram covers at least its 1/n share
        n_bigrams = r["n_tokens"] - 1
        # (1e-6 slack: the frac is rounded to 6 decimals)
        assert r["top_bigram_frac"] >= 1.0 / n_bigrams - 1e-6


def test_unigram_logprob_bounds(spark):
    """Cross-entropy under the corpus unigram LM is positive and cannot
    exceed -ln(p_min) = ln(total/min_count) <= ln(total)."""
    rows = _rows(spark, "unigram_logprob")
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert 0.0 < r["xent"] <= np.log(total) + 1e-6


def test_dsir_importance_prefers_target_slice(spark):
    """DSIR's defining property: documents from the target slice (lang='en')
    score higher mean log importance weight than the rest of the corpus."""
    rows = _rows(spark, "dsir_importance")
    en = [r["log_weight"] for r in rows if r["lang"] == "en"]
    rest = [r["log_weight"] for r in rows if r["lang"] != "en"]
    assert en and rest
    assert np.mean(en) > np.mean(rest)


def test_semantic_dedup_subset_of_exact_near_dup(spark):
    """SemDeDup pairs are exactly the near-dup pairs whose endpoints share a
    cluster: every emitted pair appears in embedding_near_dup with the same
    cosine (clustering only *removes* cross-cluster pairs)."""
    sem = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in _rows(spark, "semantic_dedup")
    }
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in _rows(spark, "embedding_near_dup")
    }
    assert sem, "no within-cluster near-dup pairs at this SF"
    for pair, cos in sem.items():
        assert pair in exact and abs(exact[pair] - cos) < 1e-12


def test_dup_span_coverage_bounds(spark):
    rows = _rows(spark, "dup_span_coverage")
    assert rows
    for r in rows:
        assert 0 <= r["covered_tokens"] <= r["n_tokens"]
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_coverage"] <= 1.0
        # a duplicated span covers at least K tokens
        if r["n_dup_grams"] > 0:
            from flink_mm_spark.operators.curation import DUP_SPAN_K

            assert r["covered_tokens"] >= DUP_SPAN_K


def test_bpe_encode_token_bounds(spark):
    """Every word encodes to >= 1 subword and <= its character count."""
    rows = _rows(spark, "bpe_encode")
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["bpe_per_word"] >= 1.0


def test_semantic_dedup_kmeans_subset_and_deterministic(spark):
    """The trained-centroid production variant keeps the SemDeDup contract:
    pairs ⊆ exact near-dup pairs with equal cosines, and the end-to-end
    run is deterministic (seeded init, bit-stable kernels)."""
    a = _rows(spark, "semantic_dedup_kmeans")
    b = _rows(spark, "semantic_dedup_kmeans")
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in _rows(spark, "embedding_near_dup")
    }
    assert a, "no within-cluster pairs at this SF"
    for r in a:
        key = (r["vec_a"], r["vec_b"])
        assert key in exact and abs(exact[key] - r["cos_sim"]) < 1e-12


def test_block_pair_cosine_matches_bruteforce_keyed(spark):
    """The shared block-pair GEMM (dedup.block_pair_cosine) must emit
    exactly the brute-force within-key pairs — including across block
    boundaries (ids straddle EMB_BLOCK_ROWS multiples via offset) and
    never across keys."""
    import pandas as pd
    from flink_mm_spark.operators import dedup as DD

    rng = np.random.RandomState(3)
    n, d = 90, 8
    # offset ids so vectors land in two different blk values
    ids = np.arange(n, dtype=np.int64) + DD.EMB_BLOCK_ROWS - n // 2
    vecs = rng.standard_normal((n, d))
    keys = (np.arange(n) % 3).astype(np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "emb": list(vecs), "grp": keys})
    df = spark.createDataFrame(pdf, "vec_id long, emb array<double>, grp long")
    got = {
        (r["grp"], r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in DD.block_pair_cosine(df, keyed=[("grp", "long")], threshold=0.2).collect()
    }
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = np.round(vn @ vn.T, 6)
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            if keys[a] == keys[b] and cos[a, b] >= 0.2:
                want[(keys[a], min(ids[a], ids[b]), max(ids[a], ids[b]))] = cos[a, b]
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_ngrams_raw_guard_short_docs(spark):
    """_ngrams_raw must yield an EMPTY array (not sequence(1,0) junk) for
    documents shorter than k tokens."""
    import pandas as pd
    from pyspark.sql import functions as F
    from flink_mm_spark.operators.curation import _ngrams_raw

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["one two", "a", "x y z w"]}), "text string"
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    out = df.select(_ngrams_raw(toks, 3).alias("g")).collect()
    assert [len(r["g"]) for r in out] == [0, 0, 2]
    assert out[2]["g"] == ["x y z", "y z w"]
