#!/usr/bin/env python
"""ANN serving walkthrough over the synthetic embeddings table: the
offline/online split a production vector-search pipeline runs.

    offline: train PQ codebooks + encode the corpus (32x compression)
    online:  ADC shortlist from codes only -> exact re-rank of the
             shortlist -> top-k

Compares recall of the PQ path against exact brute force, then shows
the two late-r10 additions: PCA-16 reduction before serving (with its
honest recall cost on this isotropic synthetic corpus) and hybrid
lexical+semantic retrieval via reciprocal-rank fusion.  Every stage is
a repo operator.  Run: ``python examples/ann_search.py [sf_dir]``.
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

    # dimensionality reduction before indexing: fit PCA once offline,
    # serve queries in the reduced space — recall against full-dim
    # exact shows what the 4x dim cut costs on this corpus
    from pyspark.sql import functions as F

    from scespet_spark.operators.similarity import (pca_fit, pca_project,
                                                    rrf_fuse)
    from scespet_spark.operators.text import bm25_topk

    model = pca_fit(emb)
    red = (pca_project(emb, model, k=16, out="pca16")
           .select("vec_id", F.col("pca16").alias("embedding")))
    red.persist().count()
    hits = total = 0
    for qid in (0, 7, 42):
        qvec = (emb.filter(f"vec_id = {qid}")
                .select("embedding").collect()[0][0])
        qred = (red.filter(f"vec_id = {qid}")
                .select("embedding").collect()[0][0])
        exact = {r.vec_id for r in brute_force_topk(emb, qvec, k=k).collect()}
        reduced = {r.vec_id
                   for r in brute_force_topk(red, qred, k=k).collect()}
        hits += len(exact & reduced)
        total += k
    print(f"pca16: recall@{k} vs full-dim exact = {hits / total:.2f}")

    # hybrid retrieval: fuse the lexical BM25 list with the semantic
    # cosine list by reciprocal rank — no score calibration needed
    docs = load_table(spark, sf_dir, "documents")
    qvec = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    lex = bm25_topk(docs, ["spark", "window", "merge"], k=50).select(
        "doc_id", "score")
    sem = brute_force_topk(emb, qvec, k=50).select(
        F.col("vec_id").alias("doc_id"), "score")
    fused = rrf_fuse([lex, sem], ["doc_id"]).limit(5).collect()
    print("hybrid top-5 (rrf):",
          [(r.doc_id, r.rrf_score) for r in fused])
    red.unpersist()

    # the production form (r12): the index as a snapshot ARTIFACT —
    # train once offline, generation-append a drop (encoded against
    # the standing model, no refit), take down two vectors, and serve
    # every query from parquet alone (no in-query training)
    import tempfile
    from scespet_spark.operators.similarity import pq_index_topk
    from scespet_spark.operators.snapshot import (read_pq_index,
                                                  retract_snapshot,
                                                  write_snapshot)
    snap = tempfile.mkdtemp(prefix="ann_example_") + "/snap"
    prior = emb.filter("vec_id % 4 != 3")
    drop = emb.filter("vec_id % 4 = 3")
    write_snapshot(snap, emb=prior, pq_m=8)
    write_snapshot(snap, emb=drop, mode="append")       # cost ∝ drop
    retract_snapshot(snap, emb=emb.filter("vec_id IN (7, 42)"))
    codes, cbs, rot, geo = read_pq_index(spark, snap)
    qvec = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    served = pq_index_topk(emb, codes, cbs, rot, qvec, k=5,
                           shortlist=50).collect()
    print(f"artifact-served top-5 (geometry {geo}):",
          [(r.vec_id, r.score) for r in served])
    assert not {7, 42} & {r.vec_id for r in served}, \
        "retracted vectors must not serve"


if __name__ == "__main__":
    main(*sys.argv[1:])
