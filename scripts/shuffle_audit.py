"""Shuffle/IO byte audit: the load-independent half of the scale evidence.

Wall-clock on this box swings ~2x with neighbor load (BASELINE.md), but the
BYTES a plan shuffles and scans are a pure function of the plan — so this
harness measures those via the Spark status REST API (/api/v1) and reports,
per audited query at $SPARK_GRAFT_SF_DIR (default sf0.1):

- shuffle_mb: bytes written to shuffles (the 100 TB network cost). This is
  the ShuffleWriteMetrics sum over the query's stages — execution-layer
  accounting, exact regardless of machine load.

The REST "inputBytes" metric is deliberately NOT reported: it mixes
filesystem reads with block-manager hits (persisted/checkpointed blocks
re-read inside iterative queries dominate it), so it cannot evidence scan
pruning. Pruning/pushdown evidence lives in tests/test_plans.py (ReadSchema
/ PushedFilters assertions), which pin the plan rather than a metric.

Narrative pairs the numbers exist to prove:
- bucketed_fact_join vs the inline fact_join_shuffle_baseline (same join
  over the source parquet, broadcast disabled) — the at-rest bucketed
  layout eliminates the fact⋈fact exchange entirely.
- embedding_near_dup vs embedding_near_dup_lsh — the LSH tier shuffles
  id+bucket rows, not the vector corpus (on the 500-row local embeddings
  table the exact tier is small; the ratio of interest is bytes per
  candidate pair).
- jaccard_token_pairs vs jaccard_prefix_filtered — prefix filtering halves
  shuffled bytes even on this corpus's worst-case 31-token vocabulary
  (where candidate-count pruning is impossible — see SCALE.md).

Usage: python scripts/shuffle_audit.py
Prints one JSON line per query plus a markdown table on stderr for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_mm_spark import registry
from flink_mm_spark.session import get_spark

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

AUDITED = [
    # relational core
    "pricing_summary",
    "local_supplier_volume",
    "bucketed_fact_join",
    # dedup family
    "dedup_exact",
    "jaccard_token_pairs",
    "jaccard_prefix_filtered",
    "minhash_lsh_pairs",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "dedup_components",
    # curation / prep
    "repetition_signals",
    "unigram_logprob",
    "pack_sequences",
    "mixture_pack_pipeline",  # broadcast plan + explode + ONE range exchange
    "shard_manifest",  # same + the shard-id hash aggregate
    "shard_write_roundtrip",  # r9: + partitionBy file write, scan-only verify
    "benchmark_contamination",
    # text / retrieval
    "bm25_topk",
    # sketches / ANN
    "hll_distinct_exact",
    "pq_adc_topk",
    "ann_lsh_topk",
    # r5 (VERDICT r4 ask #7): byte evidence for the newly driver-graded
    # exact-twin / pipeline flagships
    "minhash_lsh_exact",
    "bpe_encode",
    "bpe_bytes_encode",  # r9: byte-symbol train + held-out broadcast encode
    "curation_funnel",
    "corpus_prep_pipeline",
    # r5 batch 2: the new corpus-analytics operators
    "weighted_reservoir_sample",  # expect ~0: TakeOrderedAndProject, no exchange
    "dup_cluster_sizes",
    "token_bigram_pmi",
    "zipf_fit",
    # r6 (VERDICT r5 asks #1/#3): the substring deduper's anchor-keyed
    # exchanges, and the composed pipeline with its near-dup edge tier
    # swapped from the naive-jaccard scan to banded MinHash-LSH candidates —
    # the pair whose byte drop is the point of the variant.
    "substring_dedup",
    "corpus_prep_pipeline_minhash",
    "corpus_prep_pipeline_keepbest",  # r9: keep-best tier — no star rounds
    "wordpiece_merges",  # expect ~bpe_encode's 0.18: one word-count exchange
    "events_cms_streamed",  # expect ~0: 256 sketch cells of state, 4 probes
    "wordpiece_encode",  # two word-count-shaped exchanges + broadcast join
    "wordpiece_encode_holdout",  # same shape + the part-name word explode
    "tokenize_pack_pipeline",  # bpe_encode's exchanges + ONE range exchange
    "bigram_logprob",  # pair-key shuffle + gram-keyed scoring join
    "unigram_viterbi_encode",  # word-count + bounded substring exchanges
    "dedup_keep_best",  # pair-list-linear pruning joins over the exact twin
    "cross_source_overlap",  # 8B md5-folded gram keys, sources^2-bounded join
    "dedup_components_exact",  # star rounds: shrinking id-pair exchanges
    "ngram_novelty",  # two gram-keyed linear exchanges + rejoin
    # r10: the bounded streamed tiers + the trained language ID
    "minhash_dedup_streamed_capped",  # band rows into capped state + spool
    "corpus_ingest_bounded_streamed",  # watermarked fp-dedup state + rollup
    "shard_append_streamed",  # per-batch scan->write appends + manifest scan
    "lang_id_ngram",  # profile aggregate + broadcast scoring + doc window
    "embedding_covariance",  # ONE d²-keyed decimal aggregate, O(parts×d²)
    # r11: the streamed decision/statistics tiers + the projection kernel
    "dedup_keep_best_streamed",  # band+attrs into state, pair-linear report
    "embedding_covariance_streamed",  # per-batch term exchange into d² state
    "pca_fixed_project",  # expect ~0: scan -> Arrow stage, no exchange
    "corpus_to_shards_streamed",  # decision-store exchange + anti-join + manifest
    # r12: the strict incumbent-wins gate + streamed PQ retrieval
    "corpus_to_shards_strict",  # same chain, drop set = all pairing arrivals
    "pq_topk_streamed",  # encode exchange-free; per-batch local-topk + qid window
    "pq_encode_streamed",  # expect ~0: per-batch scan -> Arrow encode -> write
    "ivf_pq_topk_streamed",  # cell-keyed exchange: 8B codes/vector + 1KB LUT/probe
    # r13: index compaction + the bounded online tier + deletes
    "ivf_pq_index_compacted",  # statestore scan -> write; expect ~0 beyond read-back sort
    "ivf_pq_topk_streamed_capped",  # same exchange as the exact twin; state bounded
    "ivf_pq_topk_streamed_deletes",  # delete = one exchange row, like an add
]


def _api(base: str, app_id: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/{path}") as r:
        return json.load(r)


def stage_totals(base: str, app_id: str, after_stage: int) -> dict[str, int]:
    """Sum IO metrics over all stages with stageId > after_stage."""
    totals = {"inputBytes": 0, "shuffleWriteBytes": 0, "shuffleReadBytes": 0}
    max_id = after_stage
    for st in _api(base, app_id, "stages?status=complete"):
        sid = st["stageId"]
        max_id = max(max_id, sid)
        if sid <= after_stage:
            continue
        for k in totals:
            totals[k] += int(st.get(k, 0))
    totals["maxStageId"] = max_id
    return totals


def main() -> None:
    # engine defaults disable the UI; the audit needs the status API
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if not base:
        raise SystemExit("Spark UI disabled; the audit needs the status API")

    # Python-worker warmup (same reason as bench.py): a trivial pandas-UDF
    # stage so interpreter spawn cost doesn't attach to the first audited
    # query's stages (it doesn't affect bytes, but keeps runtimes sane).
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    spark.range(64, numPartitions=32).select(
        F.pandas_udf(lambda s: s + 1, "long")("id")
    ).write.format("noop").mode("overwrite").save()

    # SPARK_GRAFT_AUDIT_ONLY=a,b,c restricts the run to named entries
    # (incremental re-audits after a builder change; default = full list).
    # Names must exist in AUDITED: a typo'd filter silently auditing
    # nothing is the same harness bug as an unknown entry (ADVICE r12).
    only = os.environ.get("SPARK_GRAFT_AUDIT_ONLY")
    if only:
        wanted = set(only.split(","))
        unknown = wanted - set(AUDITED)
        if unknown:
            raise KeyError(
                f"SPARK_GRAFT_AUDIT_ONLY names not in AUDITED: {sorted(unknown)}"
            )
        audited = [n for n in AUDITED if n in wanted]
    else:
        audited = AUDITED

    rows_out = []
    watermark = stage_totals(base, app_id, -1)["maxStageId"]
    for name in audited:
        spec = registry.QUERIES.get(name)
        if spec is None:
            # no silent caps: an unknown name is a harness bug, not a skip
            raise KeyError(f"audited query {name!r} is not registered")
        df = spec.fn(spark, SF_DIR)
        # ONE execution per query (noop write = the production shape, full
        # plan, no collect) so the stage window holds exactly this query's
        # stages; a separate count() would double-count every byte.
        df.write.mode("overwrite").format("noop").save()
        t = stage_totals(base, app_id, watermark)
        watermark = t["maxStageId"]
        rec = {"query": name, "shuffle_mb": round(t["shuffleWriteBytes"] / 1e6, 2)}
        rows_out.append(rec)
        print(json.dumps(rec), flush=True)

    # Inline baseline: the same fact⋈fact join bucketed_fact_join runs, but
    # over the source parquet with broadcast disabled — the exchange the
    # at-rest bucketed layout removes.
    from pyspark.sql import functions as F  # noqa: F811
    from flink_mm_spark.sources.tables import table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
        lineitem = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        (
            orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    t = stage_totals(base, app_id, watermark)
    rec = {
        "query": "fact_join_shuffle_baseline",
        "shuffle_mb": round(t["shuffleWriteBytes"] / 1e6, 2),
    }
    rows_out.append(rec)
    print(json.dumps(rec), flush=True)

    print("\n| query | shuffle MB |", file=sys.stderr)
    print("|---|---|", file=sys.stderr)
    for r in rows_out:
        print(f"| {r['query']} | {r['shuffle_mb']} |", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
