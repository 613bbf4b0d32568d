#!/usr/bin/env python
"""Bloom pre-filter scaling: per-drop probe cost as the PRIOR grows.

The r9 scale gap: every incremental dedup probe anti-joins the whole
crawl drop against the full prior digest table, so per-drop cost grows
with the corpus, not the drop.  The Bloom rung's claim: with the
snapshot Bloom artifact, the drop's definitely-novel digests are
suppressed map-side, the Exchange carries only the residue
(~fpp x drop + true dups), and per-drop cost becomes ~flat in the
prior (the residual prior touch is the anti-join's shuffle-free
columnar scan of one int column).

Protocol: FIXED drop (200k docs, 1% true dups), prior digest tables at
1M / 10M / 30M keys; time the plain probe vs the bloom probe
(incremental_keep with/without prior_bloom=).  The filter build and
row materialization happen OUTSIDE the timings — they are snapshot
artifacts, built once per snapshot, amortized over every drop (their
one-time cost is reported separately).

Run: python tools/bloom_scale.py [drop_n] [prior sizes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scespet_spark import get_spark  # noqa: E402
from scespet_spark.operators.bloom import bloom_build, bloom_row  # noqa: E402
from scespet_spark.operators.dedup import incremental_keep  # noqa: E402
from scespet_spark.operators.hashing import h64  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main(drop_n=200_000, *priors):
    drop_n = int(drop_n)
    prior_ns = [int(p) for p in priors] or [1_000_000, 10_000_000,
                                            30_000_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # fixed drop: 99% novel texts, 1% true dups of the prior head
    drop = (spark.range(drop_n)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 100 == 0,
                           F.concat(F.lit("p"), (F.col("id") % 10_000)
                                    .cast("string")))
                    .otherwise(F.concat(F.lit("d"),
                                        F.col("id").cast("string")))
                    .alias("text"))
            .repartition(32).persist())
    drop.count()

    results = []
    for pn in prior_ns:
        pri = (spark.range(pn)
               .select(h64(F.concat(F.lit("p"), F.col("id").cast("string")))
                       .alias("content_hash"))
               .repartition(64).persist())
        pri.count()
        t0 = time.time()
        words, m, k = bloom_build(pri, "content_hash", n_items=pn,
                                  fpp=0.01)
        row = bloom_row(words, m)  # eager localCheckpoint
        build_s = time.time() - t0
        bloom = {"m": m, "k": k, "row": row}
        plain = timed(lambda: noop(incremental_keep(
            drop, pri, prior_digest_col="content_hash")))
        fast = timed(lambda: noop(incremental_keep(
            drop, pri, prior_digest_col="content_hash",
            prior_bloom=bloom)))
        results.append((pn, plain, fast, build_s, m // 8))
        print(f"prior={pn:>11,}  plain={plain:6.2f}s  bloom={fast:6.2f}s  "
              f"(filter build {build_s:.1f}s, {m // 8 / 1e6:.0f} MB)",
              flush=True)
        pri.unpersist()

    lo, hi = results[0], results[-1]
    print(f"\nprior {lo[0]:,} -> {hi[0]:,} ({hi[0] / lo[0]:.0f}x): "
          f"plain {lo[1]:.2f}s -> {hi[1]:.2f}s = {hi[1] / lo[1]:.2f}x | "
          f"bloom {lo[2]:.2f}s -> {hi[2]:.2f}s = {hi[2] / lo[2]:.2f}x")


if __name__ == "__main__":
    main(*sys.argv[1:])
