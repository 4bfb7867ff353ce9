"""Tokenizer training + sub-document dedup for LLM corpus prep.

Two operator families the reference lacks entirely (north-star additions
alongside SURVEY §2):

- ``bpe_merges``: distributed BPE tokenizer TRAINING. The only
  corpus-scale operation is the word-frequency count (one hash shuffle);
  the merge loop then runs on the compact word-frequency table — the
  standard trainer decomposition (Sennrich et al., "Neural Machine
  Translation of Rare Words with Subword Units"), which is what makes BPE
  tractable at 100 TB: rounds cost O(|vocab|), not O(corpus).
- ``chunk_dedup``: exact sub-document span dedup — the C4 "deduplicate at
  the line level" shape (Raffel et al.), with deterministic 10-token
  chunk framing because the synthetic corpus has no newlines. Chunking is
  a JVM higher-order expression over the token array (no shuffle); the
  only exchange is the keep-first window keyed on the chunk text.

Both are graded EXACTLY: merge tables and keep-counts are strings and
integers, and every iterative step is replayed by the DuckDB oracle with
identical op semantics (see docstrings for the determinism arguments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mm_spark.operators.dedup import WORD_REGEX, tokens_expr
from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table

N_MERGES = 6

# One unrolled oracle stage per merge round: count adjacent symbol pairs
# weighted by word frequency, pick the (count DESC, pair ASC) argmax, and
# apply the merge with the SAME padded non-overlapping replace the Spark
# side uses. DuckDB `replace` and Spark `replace` both substitute
# non-overlapping occurrences left to right, so consecutive repeats
# (`a a a` → `aa a`, not `a aa`) merge identically — greedy-left BPE.
_BPE_STAGE = """
, pc{k} AS (
  SELECT p, SUM(freq) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS p
    FROM (SELECT freq, string_split(seq, ' ') AS l FROM w{prev})
  ) GROUP BY p
),
best{k} AS (SELECT p, cnt FROM pc{k} ORDER BY cnt DESC, p ASC LIMIT 1),
w{k} AS (
  SELECT w, freq,
         trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT p FROM best{k}) || ' ',
                      ' ' || replace((SELECT p FROM best{k}), ' ', '') || ' ')) AS seq
  FROM w{prev}
)
"""

_BPE_ORACLE = (
    f"""
    WITH words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(trim(text)), '{WORD_REGEX}')) AS w
        FROM documents
      ) GROUP BY w
    ),
    w0 AS (
      SELECT w, freq, array_to_string(regexp_extract_all(w, '.'), ' ') AS seq
      FROM words
    )
    """
    + "".join(_BPE_STAGE.format(k=k, prev=k - 1) for k in range(1, N_MERGES + 1))
    + """
    SELECT * FROM ("""
    + " UNION ALL ".join(
        f"""
      SELECT {k} AS round,
             split_part((SELECT p FROM best{k}), ' ', 1) AS left_sym,
             split_part((SELECT p FROM best{k}), ' ', 2) AS right_sym,
             replace((SELECT p FROM best{k}), ' ', '') AS merged,
             CAST((SELECT cnt FROM best{k}) AS BIGINT) AS pair_freq"""
        for k in range(1, N_MERGES + 1)
    )
    + ") ORDER BY round"
)


def _train_merges(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Run the ``N_MERGES``-round distributed BPE training loop and return
    the merge table rows ``(round, left, right, merged, pair_freq)``.
    Shared by ``bpe_merges`` (returns the table) and ``bpe_encode``
    (applies the merges). See ``bpe_merges`` for the scale argument."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.regexp_extract_all("text", F.lit(WORD_REGEX), 0)).alias("w0"))
        .select(F.lower(F.trim(F.col("w0"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .persist()
    )
    # NOTE: tokens come from regexp_extract_all(lower(trim(text))) in the
    # oracle; lower(trim) of each extracted word is identical because the
    # regex classes are case-insensitive-safe here ([a-zA-Z]) and tokens
    # contain no surrounding whitespace.
    seqs = words.select(
        "w",
        "freq",
        F.array_join(F.regexp_extract_all("w", F.lit("."), 0), " ").alias("seq"),
    )
    out: list[tuple] = []
    try:
        for rnd in range(1, N_MERGES + 1):
            syms = seqs.select("freq", F.split("seq", " ").alias("l"))
            pairs = syms.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice("l", 1, F.size("l") - 1),
                        F.slice("l", 2, F.size("l") - 1),
                        lambda x, y: F.concat(x, F.lit(" "), y),
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("p").asc())
                .limit(1)
                .collect()
            )[0]
            pair, cnt = best["p"], int(best["cnt"])
            left, right = pair.split(" ")
            merged = left + right
            out.append((rnd, left, right, merged, cnt))
            seqs = seqs.select(
                "w",
                "freq",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.lit(f" {pair} "),
                        F.lit(f" {merged} "),
                    )
                ).alias("seq"),
            )
    finally:
        words.unpersist()
    return out


@register("bpe_merges", oracle=_BPE_ORACLE)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: the first ``N_MERGES`` merge
    rounds over the documents corpus, graded EXACTLY.

    Shape (the part that matters at 100 TB): the corpus is touched ONCE —
    an explode + hash-shuffle word count. Every merge round then runs on
    the word-frequency table (O(|vocab|) rows, distributed) and collects
    exactly one row (the argmax pair) to the driver, which owns the merge
    table — the reference's I3 outer-driver-loop shape applied to
    tokenizer training. Pair counts are exact integers (frequency-weighted
    sums), the argmax tie-breaks (count DESC, pair ASC) in both engines,
    and the merge applies via the same padded left-to-right
    non-overlapping ``replace`` — so the merge TABLE, not just counts,
    hash-matches the oracle's 6-stage replay.
    """
    out = _train_merges(spark, sf_dir)
    return spark.createDataFrame(
        out, "round int, left_sym string, right_sym string, merged string, pair_freq bigint"
    )


_BPE_ENCODE_ORACLE = (
    _BPE_ORACLE.split("SELECT * FROM (")[0]
    + f"""
    , enc AS (SELECT w, len(string_split(seq, ' ')) AS n_sub FROM w{N_MERGES}),
    dw AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(trim(text)), '{WORD_REGEX}')) AS w
      FROM documents
    )
    SELECT dw.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_words,
           CAST(SUM(e.n_sub) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(SUM(e.n_sub) AS DOUBLE) / COUNT(*), 6) AS bpe_per_word
    FROM dw JOIN enc e USING (w)
    GROUP BY dw.doc_id
    ORDER BY dw.doc_id
    """
)


@register("bpe_encode", oracle=_BPE_ENCODE_ORACLE)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY: encode every document with the merges trained
    by ``bpe_merges`` and report per-document subword counts.

    The deploy-side half of the tokenizer lifecycle (train → encode →
    ``pack_sequences``). Encoding replays the trained merge list in order
    on each word's character sequence — for replace-based greedy-left BPE
    this reproduces the training segmentation exactly, so the oracle can
    read the segmentation straight off its own stage-``N_MERGES`` word
    table.

    Scale shape: the corpus is never encoded word-by-word in Python — the
    DISTINCT word table (vocab-sized) is encoded once with a chain of
    ``N_MERGES`` JVM ``replace`` expressions (merges are literals by the
    time the plan is built), and the encoded vocab broadcast-joins back
    onto the exploded word stream; per-doc rollups are integer sums. At
    100 TB: train once (one corpus shuffle — see ``bpe_merges``), encode
    via a vocab-sized broadcast, never a per-row Python tokenizer.
    """
    merges = _train_merges(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(WORD_REGEX), 0)).alias("w0"),
    ).select("doc_id", F.lower(F.trim(F.col("w0"))).alias("w"))
    seq = F.array_join(F.regexp_extract_all("w", F.lit("."), 0), " ")
    for _, left, right, merged, _cnt in merges:
        seq = F.trim(
            F.replace(
                F.concat(F.lit(" "), seq, F.lit(" ")),
                F.lit(f" {left} {right} "),
                F.lit(f" {merged} "),
            )
        )
    enc = dw.select("w").distinct().select("w", F.size(F.split(seq, " ")).alias("n_sub"))
    return (
        dw.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
            F.round(F.sum("n_sub").cast("double") / F.count("*"), 6).alias(
                "bpe_per_word"
            ),
        )
        .orderBy("doc_id")
    )


CHUNK_TOKENS = 10

_CHUNK_ORACLE = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS a
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, c.chunk_idx, c.chunk, c.n_tok FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, 1 + CAST(ceil(len(a) / {CHUNK_TOKENS}.0) AS INT)),
                 i -> struct_pack(
                   chunk_idx := i - 1,
                   chunk := array_to_string(a[(i - 1) * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS}], ' '),
                   n_tok := len(a[(i - 1) * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS}])))) AS c
        FROM toks
      )
    ),
    marked AS (
      SELECT doc_id, chunk_idx, n_tok,
             (doc_id, chunk_idx) = MIN((doc_id, chunk_idx)) OVER (PARTITION BY chunk) AS keep
      FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM marked GROUP BY doc_id ORDER BY doc_id
"""


@register("chunk_dedup", oracle=_CHUNK_ORACLE)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact span dedup — the C4 line-level dedup shape
    (Raffel et al.: drop any repeated three-sentence span corpus-wide,
    keeping its first occurrence). The synthetic corpus has no newlines,
    so the span framing is deterministic 10-token chunks; the keep rule
    is first occurrence by (doc_id, chunk_idx), matching C4's "keep one".

    Scale shape: chunking is a pure JVM higher-order expression over the
    token array (transform + slice — no shuffle, no Python); the ONLY
    exchange is the keep-first window keyed on the chunk text (at 100 TB
    key on ``xxhash64(chunk)`` instead to shrink the shuffle rows — same
    plan). The per-doc rollup rides the same partitioning. Output is pure
    integers → exact oracle.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", tokens_expr().alias("a"))
    n_chunks = F.ceil(F.size("a") / F.lit(float(CHUNK_TOKENS))).cast("int")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.array_join(
                    F.slice("a", (i - 1) * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
                ),
            )
        ).alias("chunk_idx", "chunk"),
    ).select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.size(F.split("chunk", " ")).alias("n_tok"),
    )
    from pyspark.sql.window import Window

    first = F.min(F.struct("doc_id", "chunk_idx")).over(Window.partitionBy("chunk"))
    marked = chunks.withColumn(
        "keep", F.struct("doc_id", "chunk_idx") == first
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
        )
        .orderBy("doc_id")
    )
