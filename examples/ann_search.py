#!/usr/bin/env python
"""ANN serving walkthrough over the synthetic embeddings table: the
offline/online split a production vector-search pipeline runs.

    offline: train PQ codebooks + encode the corpus (32x compression)
    online:  ADC shortlist from codes only -> exact re-rank of the
             shortlist -> top-k

Compares recall of the PQ path against exact brute force.  Every stage
is a repo operator.  Run: ``python examples/ann_search.py [sf_dir]``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scespet_spark import get_spark
from scespet_spark.operators.similarity import (brute_force_topk, pq_adc_topk,
                                                pq_train)
from scespet_spark.sources.batch import load_table


def main(sf_dir="/root/testdata/sf0.01"):
    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    # offline: codes are what a 100 TB corpus keeps in RAM
    codes, cents = pq_train(emb)
    n_vec = emb.count()
    print(f"corpus: {n_vec} vectors -> {codes.count()} code rows "
          f"({cents.count()} codebook entries)")

    # online: serve a few queries, compare against exact top-k; the
    # shortlist size is the recall/cost knob (ADC scans codes either
    # way — only the exact re-rank grows)
    k = 10
    for shortlist in (50, 150):
        hits = total = 0
        for qid in (0, 7, 42):
            qvec = (emb.filter(f"vec_id = {qid}")
                    .select("embedding").collect()[0][0])
            exact = {r.vec_id
                     for r in brute_force_topk(emb, qvec, k=k).collect()}
            approx = {r.vec_id
                      for r in pq_adc_topk(emb, qvec, k=k,
                                           shortlist=shortlist).collect()}
            hits += len(exact & approx)
            total += k
        print(f"shortlist={shortlist}: recall@{k} = {hits / total:.2f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
