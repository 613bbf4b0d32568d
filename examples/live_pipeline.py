#!/usr/bin/env python
"""One expression, two modes — the reference's central contract
(stubs/src/gsa/esg/mekon/core/EventSource.java:3-6): the SAME verbs run
over historic data as a batch plan and over a live source as a
Structured Streaming plan, ending in a durable checkpointed sink.

This walkthrough builds one pipeline (filter purchases → key by user →
daily windows → reduce), runs it batch and live over the same events,
shows the results agree, then writes the live result to a checkpointed
parquet sink and proves a restart is exactly-once.

Run: ``python examples/live_pipeline.py [sf_dir] [out_dir]``.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scespet_spark import Every, get_spark
from scespet_spark.sources.batch import events_stream
from scespet_spark.streaming.live import LiveStream


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str | None = None) -> tuple[int, int]:
    spark = get_spark(cpus=8)
    out_dir = out_dir or tempfile.mkdtemp(prefix="live_pipeline_")

    # -- the pipeline, batch mode ------------------------------------
    batch = (events_stream(spark, sf_dir)
             .filter(F.col("event_type") == "purchase")
             .by("user_id", name="user_id")
             .group(Every("1 day"))
             .reduce(total=F.sum("value"), n=F.count("*")))
    n_batch = batch.df.count()
    print(f"batch rows: {n_batch}")

    # -- the SAME pipeline, live mode --------------------------------
    live = (LiveStream.from_events(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .by("user_id")
            .group(Every("1 day"))
            .reduce(total=F.sum("value"), n=F.count("*")))
    got = live.run("complete")
    n_live = got.count()
    print(f"live rows:  {n_live} (modes agree: {n_live == n_batch})")

    # -- durable output: checkpointed sink, exactly-once restart -----
    out, ckpt = f"{out_dir}/purchases", f"{out_dir}/ckpt"
    raw = (LiveStream.from_events(spark, sf_dir)
           .filter(F.col("event_type") == "purchase"))
    raw.to_parquet(out, ckpt)
    n1 = spark.read.parquet(out).count()
    # a restart against the same checkpoint replays nothing
    (LiveStream.from_events(spark, sf_dir)
     .filter(F.col("event_type") == "purchase")).to_parquet(out, ckpt)
    n2 = spark.read.parquet(out).count()
    print(f"sink rows after run 1: {n1}, after restart: {n2} "
          f"(exactly-once: {n1 == n2})")

    # -- r6 verbs: a K->K2 keyed-bucket join and a separate-stream
    # gate, both as streaming plans (the CEP shapes that used to be
    # batch-only) ----------------------------------------------------
    src = LiveStream.from_events(spark, sf_dir)
    purchases = (src.filter(F.col("event_type") == "purchase")
                 .map(xv=F.col("value")).by("user_id"))
    clicks = (src.filter(F.col("event_type") == "click")
              .map(bucket=F.col("user_id") % 5, yv=F.col("value"))
              .by("bucket"))
    km = purchases.take(clicks, ["xv"], ["yv"],
                        key_map=F.col("user_id") % 5).run("append")
    print(f"live keymap take emissions: {km.count()}")

    src2 = LiveStream.from_events(spark, sf_dir)
    data = src2.filter(F.col("event_type") == "purchase").by("user_id")
    gate = (src2.filter(F.col("event_type") == "click")
            .map(g=F.col("value") >= 100).by("user_id"))
    wf = data.window_from(gate, "g", "value", quantize=100).run("append")
    print(f"live window_from closed windows: {wf.count()}")

    # -- r6 crawl gate: every snapshot artifact applied to ONE live
    # document stream — segment election against the prior corpus's
    # digest table, then the CCNet perplexity gate from the snapshot
    # LM + threshold (zero corpus passes on the hot path) ------------
    from scespet_spark.operators.dedup import segment_digests
    from scespet_spark.operators.text import (bigram_lm_apply,
                                              bigram_lm_model,
                                              bigram_lm_score)
    from scespet_spark.sources.batch import load_table
    from scespet_spark.streaming.live import (first_wins,
                                              read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 3 == 0)          # kept corpus
    seg_table = segment_digests(prior).select("__d").distinct()
    lm = bigram_lm_model(prior)
    thr = (bigram_lm_score(prior)
           .agg(F.percentile(F.col("mean_logp"), F.lit(0.1)))
           .collect()[0][0])
    crawl = read_table_stream(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 3 != 0)
    novel = first_wins(
        segment_digests(crawl).join(seg_table, "__d", "left_anti")
        .select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"),
                F.col("__d").alias("segment_hash")),
        keys=["segment_hash"], order_cols=["doc_id", "seg_idx"],
        payload_cols=["doc_id", "seg_idx"])
    n_novel = run_available_now(novel, "append").count()
    kept = run_available_now(
        bigram_lm_apply(crawl, lm).filter(F.col("mean_logp") >= F.lit(thr)),
        "complete").count()
    print(f"live crawl gate: {n_novel} novel segments elected, "
          f"{kept} docs pass the snapshot perplexity gate")
    return n_batch, n_live


if __name__ == "__main__":
    main(*sys.argv[1:])
