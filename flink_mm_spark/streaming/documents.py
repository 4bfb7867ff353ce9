"""Streamed incremental near-dup detection over the documents corpus (r9).

The daily-crawl shape every production dedup pipeline eventually needs
(VERDICT r8 ask #4): documents ARRIVE over time, and each arrival must be
checked against a PERSISTED MinHash band store instead of a batch re-scan
of the whole corpus. Here the band store is Structured Streaming keyed
state: band rows group by (source, band_id, band_key) through
``applyInPandasWithState``, the state value is the bucket's accumulated
(doc_id, signature) members, and each arriving document scores against the
bucket's PRIOR members only — so every near-dup pair is emitted exactly
once no matter how arrivals split across micro-batches, and the union over
time equals the batch ``minhash_lsh_exact`` candidate list on the same
corpus. The DuckDB oracle replays the whole chain bit-for-bit (signatures,
banding, and the 1/32-dyadic slot-match estimates are shared definitions
with operators/dedup.py: ``mhx_signatures`` / ``band_key_exprs``).

State-size honesty (SCALE.md): unlike the batch twins' id-only exchanges,
the state rows here must CARRY the 32×8 B signature — the store IS what
future arrivals score against — so state per bucket is O(members × ~264 B)
and total store size is O(corpus × bands) spread across the state backend.
The exact twin cannot cap hot buckets (the oracle replays every candidate);
a production deployment layers the throughput tier's hot-bucket cap and a
TTL eviction (``GroupStateTimeout``) on top — both patterns are already
demonstrated by ``_banded_pairs(hot_cap=True)`` and the watermarked
streams in streaming/events.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_mm_spark.operators.dedup import (
    MHX_BANDS,
    MHX_PERM,
    MHX_THRESHOLD,
    _mhx_oracle,
    band_key_exprs,
    mhx_signatures,
)
from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table

# documents parquet carries no timestamps, so the declared stream schema
# needs none of the NTZ normalization events go through (sources/tables.py)
DOCS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    glob: str = "*.parquet",
) -> DataFrame:
    """File-source stream of documents parquet files under ``path``."""
    reader = spark.readStream.schema(DOCS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", glob).parquet(path)


def minhash_band_store(bands: DataFrame) -> DataFrame:
    """The incremental band store: a stateful probe-then-add per bucket.

    Input: streaming (doc_id, source, sig, band_id, band_key) band rows.
    Each bucket's state holds the (doc_id, sig) members accumulated so
    far; a micro-batch's arrivals process in doc_id order, each scoring
    against the members already IN the store (never against itself or
    later arrivals), then joining it — so each unordered in-bucket pair is
    scored exactly once across the stream's lifetime, reproducing the
    batch band self-join's ``doc_a < doc_b`` orientation without its
    shuffle. Emitted pairs are the ≥-threshold candidates; cross-band
    duplicates (a pair sharing 2+ bands) dedupe downstream exactly like
    the batch pipeline's ``dropDuplicates``.

    Estimates are matches/32 — dyadic rationals, so float equality with
    the batch kernel and the SQL replay is exact. State schema is the
    member arrays; output mode append (pairs are immutable facts).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("doc_a", T.LongType()),
            T.StructField("doc_b", T.LongType()),
            T.StructField("est_jaccard", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
        ]
    )

    def probe_then_add(key, pdfs, state: GroupState):
        if state.exists:
            ids, sigs = state.get
            ids = [int(i) for i in ids]
            sigs = [np.asarray(s, dtype=np.int64) for s in sigs]
        else:
            ids, sigs = [], []
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        out_a: list[int] = []
        out_b: list[int] = []
        out_e: list[float] = []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            did = int(doc_id)
            v = np.asarray(sig, dtype=np.int64)
            for oid, osig in zip(ids, sigs):
                est = int((v == osig).sum()) / MHX_PERM
                if est >= MHX_THRESHOLD:
                    lo, hi = (oid, did) if oid < did else (did, oid)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_e.append(est)
            ids.append(did)
            sigs.append(v)
        state.update((ids, [[int(x) for x in s] for s in sigs]))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_e})

    return bands.groupBy("source", "band_id", "band_key").applyInPandasWithState(
        probe_then_add, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


_SRC_SPLIT_CACHE: dict[str, str] = {}  # sf_dir -> 4-file arrival-split dir
_SINK_CACHE: list[str] = []  # previous invocation's memory-sink table name


def _arrival_split(spark: SparkSession, sf_dir: str) -> str:
    """The 4-file arrival split of the documents corpus, cached per
    (process, sf_dir): repeated invocations (bench medians, grading after
    tests) stream the IDENTICAL files instead of re-writing the split —
    every consumer here is arrival-order independent, so reuse changes
    cost, not semantics. Shared by both streamed-dedup entries."""
    from flink_mm_spark.session import scratch_dir

    src = _SRC_SPLIT_CACHE.get(sf_dir)
    if src is None:
        src = scratch_dir("mds_src_")
        table(spark, sf_dir, "documents").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        _SRC_SPLIT_CACHE[sf_dir] = src
    return src


def minhash_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, source, sig, band_id, band_key) band rows for the store —
    the batch pipeline's banding over the shared signature definition.

    NULL-source rows are dropped to match the batch twin EXACTLY (review
    r9): the batch band self-join's ``a.source = b.source`` and the
    oracle's identical predicate never match NULL, while a streaming
    groupBy would bucket all NULL sources together and emit pairs the
    batch side cannot — latent on current testdata (no NULL sources), but
    the 'shared definition' claim has to hold on any input."""
    return mhx_signatures(docs).filter(F.col("source").isNotNull()).select(
        "doc_id",
        "source",
        "sig",
        band_key_exprs(MHX_BANDS, MHX_PERM // MHX_BANDS).alias("band_id", "band_key"),
    )


@register("minhash_dedup_streamed", oracle=_mhx_oracle())
def minhash_dedup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup candidates computed INCREMENTALLY by a real
    streaming query, graded against the batch exact twin's full SQL
    replay: the documents corpus is split into 4 parquet files and
    streamed one file per micro-batch, so later arrivals genuinely probe
    a band store populated by EARLIER micro-batches (the daily-crawl
    shape — ``minhash_lsh_exact`` is the from-scratch batch run this
    replaces once a corpus goes incremental). The drained pair stream,
    deduped across bands, must value-hash-match the batch oracle — pairs
    whose documents arrived in different batches exist ONLY if the state
    store carried the earlier member, so the grade covers the store, not
    just the per-batch math. Restart recovery of the store is pinned in
    tests/test_streaming.py::test_minhash_dedup_stream_restart_recovery
    (foreachBatch sink — the memory sink refuses checkpoint recovery
    outside complete mode).

    Scale shape: per micro-batch the plan is the batch signature
    projection (one Arrow stage) plus ONE exchange keyed on (source,
    band, band_key) into the state store — there is no self-join anywhere;
    the store replaces it with O(bucket members) state probes. The
    downstream dropDuplicates is pair-list-sized, exactly like the batch
    pipeline's candidate dedup."""
    import uuid

    from flink_mm_spark.session import scratch_dir

    src = _arrival_split(spark, sf_dir)
    bands = minhash_band_rows(documents_stream(spark, src, max_files_per_trigger=1))
    # sink swap (review r9, the module-cache discipline applied to memory
    # sinks): each invocation's uniquely-named sink would otherwise pin its
    # full pair list in driver memory for the session lifetime — bench
    # medians and grading call this entry many times per session
    while _SINK_CACHE:
        spark.catalog.dropTempView(_SINK_CACHE.pop())
    name = f"minhash_dedup_streamed_{uuid.uuid4().hex[:8]}"
    _SINK_CACHE.append(name)
    q = (
        minhash_band_store(bands)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir("mds_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


def ingest_rollup(stream: DataFrame) -> DataFrame:
    """The ingestion-gate pipeline body over a documents stream: stateless
    quality floor -> per-(source, md5-fingerprint) exact-dedup state ->
    per-source (n_docs, n_tokens) rollup. Shared by the registered entry
    and the restart-recovery test (which proves the fingerprint state
    survives a checkpoint stop: re-delivered duplicates would double-count
    into the complete-mode aggregate if state were rebuilt from scratch)."""
    from flink_mm_spark.operators.dedup import _PREP_MIN_TOKENS, WORD_REGEX

    n_tok = F.size(F.regexp_extract_all("text", F.lit(WORD_REGEX), 0))
    accepted = (
        stream.withColumn("n_tok", n_tok)
        .filter(F.col("n_tok") >= _PREP_MIN_TOKENS)
        .withColumn("fp", F.md5(F.lower(F.trim("text")).cast("binary")))
        .dropDuplicates(["source", "fp"])
    )
    return accepted.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


_INGEST_SINK_CACHE: list[str] = []  # previous ingest invocation's sink table


def _ingest_oracle() -> str:
    from flink_mm_spark.operators.dedup import _PREP_MIN_TOKENS, WORD_REGEX

    return f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM (
      SELECT DISTINCT source, md5(lower(trim(text))) AS fp,
             len(regexp_extract_all(text, '{WORD_REGEX}')) AS n_tok
      FROM documents
      WHERE len(regexp_extract_all(text, '{WORD_REGEX}')) >= {_PREP_MIN_TOKENS}
    )
    GROUP BY source ORDER BY source
    """


@register("corpus_ingest_streamed", oracle=_ingest_oracle())
def corpus_ingest_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONLINE ingestion gate every crawl pipeline runs before anything
    else touches a document, executed as a real streaming query: arriving
    documents pass a stateless quality floor (the funnel's token minimum,
    a JVM regex count), then per-(source, md5-fingerprint) EXACT dedup
    holds the seen-fingerprint set as streaming state (``dropDuplicates``
    — duplicates arriving in LATER micro-batches are dropped only if the
    state carried the earlier fingerprint, which the 4-file arrival split
    exercises), and the accepted stream rolls up per source. Complements
    ``minhash_dedup_streamed``: that entry is the NEAR-dup band store;
    this is the exact-dedup admission gate in front of it.

    Exactness despite nondeterministic winners: ``dropDuplicates`` keeps
    an arbitrary copy per key, but exact duplicates share their text
    byte-for-byte, so every kept copy contributes identical (n_tok)
    values and the per-source integer rollup is arrival-order
    independent — the oracle is a plain DISTINCT-then-aggregate. Keyed by
    (source, fingerprint), not fingerprint alone: a cross-source
    duplicate keeps one copy PER source, which is what makes per-source
    accounting deterministic (global dedup would attribute the survivor
    to whichever source arrived first).

    Scale: the quality filter is scan-side (drops rows BEFORE they cost
    state); dedup state is one ~32-byte fingerprint per accepted
    (source, doc) forever — in production the same query uses
    ``dropDuplicatesWithinWatermark`` so state is bounded by the
    duplicate-arrival horizon (the ``events_dedup_streamed`` pattern);
    the rollup is a tiny-key (|sources|) aggregate in complete mode."""
    import uuid

    from flink_mm_spark.session import scratch_dir

    src = _arrival_split(spark, sf_dir)
    agg = ingest_rollup(documents_stream(spark, src, max_files_per_trigger=1))
    while _INGEST_SINK_CACHE:
        spark.catalog.dropTempView(_INGEST_SINK_CACHE.pop())
    name = f"corpus_ingest_streamed_{uuid.uuid4().hex[:8]}"
    _INGEST_SINK_CACHE.append(name)
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", scratch_dir("ci_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("source")
