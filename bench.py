#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced to full execution with a noop write (distributed
materialization — no driver collect, so timings measure the plan, not
result transfer).  A warm-up query first amortizes JVM/session startup
out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from scespet_spark import get_spark  # noqa: E402

#: headline set: one per operator family (relational, CEP core, slicing,
#: temporal join, custom reducer, dedup, ANN, text).
HEADLINE = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "region_revenue",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "window_rank_orders",
    "by_reduce_total",
    "scan_running_sum",
    "group_time_reduce",
    "slice_before_signup",
    "window_gated_reduce",
    "zip_click_purchase",
    "asof_purchase_last_click",
    "asof_broadcast_purchase_last_click",
    "ewma_final_per_user",
    "session_windows_user",
    "dedup_exact",
    "dedup_minhash_lsh",
    "doc_chunking",
    "stratified_sample_docs",
    "redact_pii",
    "ann_brute_force_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_fingerprint",
    "multimodal_decode",
    "dedup_ngram_jaccard",
    "zip_keymap_region_value",
    "keymap_take_region_value",
    "decontaminate_eval_overlap",
    "pack_training_sequences",
    "shuffle_deterministic_shards",
    "quantize_embeddings_int8",
    "text_repetition",
    "text_corpus_idf",
    "sample_source_quota",
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
    "text_bigram_lm",
    "dedup_incremental",
    "dedup_incremental_near",
    "mixture_sample_sources",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "cube_returnflag_status",
    "pivot_user_event_values",
    "daily_revenue_delta",
    "ann_hard_negatives",
    # round 6 additions
    "ann_ivf_incremental_topk",
    "dedup_embedding_incremental",
    "weighted_sample_chars",
    "window_from_reduce",
    "dedup_segments",
    "perplexity_filter_docs",
    "top_ngrams_source",
    "text_collapse_repeats",
    "dedup_incremental_segments",
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "contamination_fraction_docs",
    "dedup_semantic",
    "trailing_week_revenue",
    # round 7 additions
    "dedup_substring",
    "dedup_incremental_substring",
    "text_quality_classifier",
    "dedup_url_canonical",
    "cluster_balance_sample",
    "split_train_val_test",
    # round 8 additions
    "lang_id_classifier",
    "c4_rule_filter",
    "pack_bestfit_sequences",
    "dsir_sample_topk",
    "bpe_tokenize_docs",
    "bm25_topk_docs",
    # round 9 additions
    "text_trigram_lm",
    "text_ngram_lm_order5",
    "dedup_exact_wide",
    "ccnet_perplexity_buckets",
    "url_rule_filter_docs",
    "curriculum_order_docs",
    "token_budget_docs",
    "gopher_repetition_docs",
    "filter_stack_docs",
    # round 9 batch-2 additions
    "host_cap_docs",
    "exact_quantiles_price",
    "unigram_tokenize_docs",
    "range_join_price_bands",
    "exact_quantiles_by_source",
    # round 10 additions
    "dedup_incremental_bloom",
    "dedup_incremental_near_bloom",
    "temperature_mixture_docs",
    "filter_funnel_report",
    "quality_pr_curve",
    "split_leakage_report",
    "doc_novelty_vs_prior",
    "vocab_drift_drop",
    "embedding_drift_drop",
    # round 10 batch-2: the lifecycle-bucket family after the
    # mapInPandas rewrite (22.5s -> 1.05s at sf0.01), hybrid RRF
    # retrieval, distributed PCA, key-skew diagnostics
    "bucket_collapse_stats",
    "hybrid_search_rrf",
    "embedding_pca_project",
    "key_skew_sources",
    "zorder_key_lineitem",
    # round 11 additions: generational cluster maintenance and the
    # PCA -> IVF-PQ composed serving chain
    "dedup_incremental_clusters",
    "ann_pca_ivfpq_topk",
    # late-r11: cluster-aware splits + generational IDF
    "split_cluster_aware",
    "text_idf_incremental",
    # round 12 additions: learned-rotation PQ serving, the doc_freq
    # artifact lifecycle (write -> append -> retract -> serve), and the
    # artifact-served PQ index (offline build + generation append)
    "ann_opq_adc_topk",
    "snapshot_doc_freq_lifecycle",
    "ann_pq_index_topk",
    "ann_pq_index_incremental_topk",
    "ann_ivfpq_index_topk",
    "ann_pq_index_batch_topk",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="scespet-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # warm-up: JVM, codegen, parquet footer caches, and the Python UDF
    # worker pool (so pandas-UDF queries measure steady-state plan cost,
    # not one-time worker spawn + pandas import)
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    import pandas as pd  # noqa: F401
    warm = spark.range(10_000, numPartitions=64)
    warm.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()
    from scespet_spark.sources.batch import TABLES, load_table
    for tbl in TABLES:  # parquet footers/schemas for every input table
        load_table(spark, sf_dir, tbl).write.format("noop").mode(
            "overwrite").save()

    # min of 3 runs per query: the box shares CPUs with the driver
    # harness, and a single sample can be inflated several-fold by
    # concurrent load (measured: identical queries vary 4x between
    # samples); the min reflects the plan's steady-state cost (the
    # quantity that actually scales with data volume)
    from scespet_spark.operators import dedup, similarity, text
    timings: dict[str, float] = {}
    spreads: list[float] = []
    # sibling artifact (r10 verdict item #8): BENCH_r*.json tails have
    # truncated in past rounds, losing the head of the timing dict and
    # making round-over-round comparison depend on tail luck.  Flush
    # the complete per-query dict to its own file AFTER EVERY QUERY so
    # the artifact is whole even if this process dies mid-run.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL_latest.json")

    def flush():
        with open(full_path, "w") as f:
            json.dump({"sf": sf, "queries": timings,
                       "n_queries": len(timings),
                       # +1: the snapshot_build entry appended after
                       # the query loop (r13)
                       "complete": len(timings) >= len(HEADLINE)}, f,
                      indent=0, sort_keys=True)

    for name in HEADLINE:
        samples = []
        for _ in range(3):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        # operator-persisted intermediates (LSH signatures, training
        # points) must not accumulate across the session — each query's
        # timing should include its own persists and nothing else's
        dedup.release_cached()
        similarity.release_cached()
        text.release_cached()
        timings[name] = round(min(samples), 3)
        if min(samples) > 0:
            spreads.append(max(samples) / min(samples))
        flush()

    # r13 (verdict item 4): the artifact-serving queries read standing
    # snapshot artifacts built once per process, and min-of-3 erased
    # that build cost from every recorded number.  Time the build
    # itself — write_snapshot of the prior-generation artifact set
    # (band table + cluster labels + doc_freq + band Bloom: exactly
    # the families `_artifact_snapshot` builds for the serving
    # queries) into a FRESH temp dir per sample, deleted afterwards —
    # nothing persists across samples or runs.
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from scespet_spark.operators.snapshot import write_snapshot
    from scespet_spark.sources.batch import load_table as _lt
    samples = []
    for _ in range(3):
        base = tempfile.mkdtemp(prefix="scespet_bench_snap_")
        t0 = time.time()
        prior = _lt(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 3 == 0)
        write_snapshot(base + "/snap", docs=prior, cluster_labels=True,
                       doc_freq=True, doc_families=("bands",),
                       bloom_fpp=0.01)
        samples.append(time.time() - t0)
        dedup.release_cached()
        similarity.release_cached()
        text.release_cached()
        shutil.rmtree(base, ignore_errors=True)
    timings["snapshot_build"] = round(min(samples), 3)
    if min(samples) > 0:
        spreads.append(max(samples) / min(samples))
    flush()

    # same-build repeat spread: max/min ratio of the 3 identical samples
    # per query.  This quantifies this box's co-tenant noise so round-
    # over-round deltas inside the band are separable from real
    # regressions (an identical plan re-run this far apart is noise).
    spreads.sort()
    noise = {
        "median_samplespread": round(spreads[len(spreads) // 2], 2),
        "p90_samplespread": round(spreads[int(len(spreads) * 0.9)], 2),
        "max_samplespread": round(spreads[-1], 2),
    } if spreads else {}

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeat_spread": noise,
    }))


if __name__ == "__main__":
    main()
