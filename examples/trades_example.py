#!/usr/bin/env python
"""The reference's canonical trades walkthrough re-expressed Spark-first
(reference: test/programs/TradesExample.scala — IteratorEvents over a
literal trade list, fold_all running sum, group(2.events).reduce, keyed
VWAP).  Run: ``python examples/trades_example.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scespet_spark import Count, Stream, get_spark


def main():
    spark = get_spark(cpus=8)
    trades = [  # (t, seq, name, price, qty) — TradesExample.scala:20-28
        (0, 0, "VOD", 1.12, 1), (1, 1, "VOD", 2.12, 10),
        (2, 2, "MSFT", 3.12, 2), (3, 3, "VOD", 4.12, 100),
        (4, 4, "MSFT", 5.12, 20), (5, 5, "VOD", 6.12, 1000),
        (6, 6, "MSFT", 7.12, 200), (7, 7, "VOD", 8.12, 10000),
        (8, 8, "MSFT", 9.12, 2000),
    ]
    s = Stream(spark.createDataFrame(
        trades, "ts long, seq long, name string, price double, qty long"),
        t="ts", seq="seq")

    # testFoldAll: running sum of qty over the whole stream
    print("== fold_all(Sum) — running total volume ==")
    s.map(qty2=F.col("qty")).scan(acc_vol=F.sum("qty")).df \
        .orderBy("seq").select("name", "qty", "acc_vol").show()

    # testReduceEach: pairs of trades bucketed, reduced to volume sums
    print("== group(2.events).reduce — per-pair volume ==")
    s.group(Count(2)).reduce(acc_vol=F.sum("qty")).df.orderBy("seq").show()

    # keyed demux + VWAP per symbol (RealTradeTests-style analysis)
    print("== by(name): per-symbol running VWAP ==")
    vwap = (s.by("name", name="name")
            .scan(pv=F.sum(F.col("price") * F.col("qty")), v=F.sum("qty"))
            .map(vwap=F.round(F.col("pv") / F.col("v"), 4)))
    vwap.df.orderBy("seq").select("name", "price", "qty", "vwap").show()


if __name__ == "__main__":
    main()
    from scespet_spark import get_spark
    get_spark(cpus=8).stop()
