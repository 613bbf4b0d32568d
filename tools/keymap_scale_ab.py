#!/usr/bin/env python
"""Fan-out-scaled A/B for the r12 keymap zip rewrite (verdict item 8):
U live user cells over B buckets, C clicks per bucket -> each click
fires U/B cells, so emissions = C*U + purchases.  The old form sorted
the replicated fan-out through one per-cell window; the new form
windows each single input stream and the fan-out exists only as join
output.

Usage: python tools/keymap_scale_ab.py [U] [C]; run once on HEAD, then
``git checkout 6a2817f~1 -- scespet_spark/core/stream.py`` and re-run
for the pre-rewrite side (restore with ``git checkout HEAD -- ...``).
Measured (U=20000, C=3000, 48.6M emissions, min of 3 noop runs):
old 11.5s, new 2.4s — 4.8x."""
import os
import sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from scespet_spark import get_spark
from scespet_spark.core.stream import Stream

U = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
B = 5
C = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

spark = get_spark(app_name="keymap-ab")
spark.sparkContext.setLogLevel("ERROR")
# left: one purchase per user at t=2*u, value u
left = (spark.range(U).select(
    F.col("id").alias("user_id"),
    (F.col("id") * 2).alias("ts_raw"),
    F.col("id").alias("event_id"),
    F.col("id").cast("double").alias("value")))
# right: C clicks per bucket spread over time
right = (spark.range(B * C).select(
    (F.col("id") % B).alias("bucket"),
    (F.col("id") * 7 + 1).alias("ts_raw"),
    (F.col("id") + 10_000_000).alias("event_id"),
    (F.col("id") % 100).cast("double").alias("yv")))
lts = F.timestamp_micros(F.col("ts_raw")).alias("ts")
left = left.select("user_id", lts, "event_id", F.col("value").alias("xv"))
right = right.select("bucket", F.timestamp_micros(F.col("ts_raw")).alias("ts"), "event_id", "yv")

purchases = Stream(left, t="ts", seq="event_id", keys=("user_id",))
clicks = Stream(right, t="ts", seq="event_id", keys=("bucket",))
for rnd in range(3):
    t0 = time.time()
    out = purchases.zip_join(clicks, ["xv"], ["yv"], key_map=F.col("user_id") % B)
    out.df.write.format("noop").mode("overwrite").save()
    print(f"round {rnd}: {time.time()-t0:.2f}s", flush=True)
