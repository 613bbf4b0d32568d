#!/usr/bin/env python
"""Measure sign-LSH *block recall* for the embedding near-dup probe —
the tuning evidence for the ``bits`` choice in
``incremental_embedding_near_dup`` / ``embedding_near_dup_pairs``.

Builds a near-dup-dense corpus: each sf0.01 embedding plus jittered
variants at several noise levels (achieved cosine ~0.99 down to ~0.6).
The true-pair set is (original, variant) BY CONSTRUCTION — no all-pairs
ground truth needed — and recall per achieved-cosine band is the
fraction of true pairs whose sign-LSH blocks collide, i.e. the fraction
the incremental probe would surface.

Theory: for two vectors at angle theta, one random hyperplane agrees
with probability 1 - theta/pi; b independent bits collide with
(1 - theta/pi)^b.  At cosine .99 (theta ~ 8deg) and bits=6 that is
~0.76 per single code — near-exact dups are caught with high
probability, low-cosine pairs mostly not (the point: they are not
near-dups).  Raising recall at fixed precision = multiple independent
code tables (band the bits), the same trade MinHash-LSH makes.

Usage: python tools/embedding_recall.py [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from scespet_spark import get_spark  # noqa: E402
from scespet_spark.operators.dedup import embedding_block_table  # noqa: E402


def planted_recall(spark, n=2000, k=10, qids=(3, 77, 500, 901, 1500)):
    """ANN recall@k curves on the PLANTED-CLUSTER fixture
    (`sources.batch.planted_embeddings`) — what the operators deliver
    on cluster-structured data (a real embedding corpus), vs the
    near-isotropic driver synthetic where all pairwise cosines crowd
    together and exact-top-k recall through any index is honestly
    noisy.  Ground truth = exact full-dim cosine top-k (numpy)."""
    from scespet_spark.operators.similarity import (cosine, ivf_topk,
                                                    ivfpq_topk, pca_fit,
                                                    pca_project)
    from scespet_spark.sources.batch import planted_embeddings

    emb = planted_embeddings(spark, n=n).persist()
    rows = emb.collect()
    X = np.array([r.embedding for r in rows])
    ids = np.array([r.vec_id for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    truth = {}
    for q in qids:
        s = np.round(Xn @ Xn[list(ids).index(q)], 6)
        truth[q] = {int(i) for _, i in sorted(zip(-s, ids))[:k]}
    qvec = {q: [float(x) for x in X[list(ids).index(q)]] for q in qids}

    def rec(got_sets):
        return sum(len(g & truth[q]) / k for q, g in got_sets) / len(qids)

    print(f"planted-cluster fixture (n={n}, 20 centers): recall@{k}")
    for nprobe in (1, 2, 4):
        r = rec([(q, {x.vec_id for x in
                      ivf_topk(emb, qvec[q], k=k, nprobe=nprobe)
                      .collect()}) for q in qids])
        print(f"  ivf_topk       nprobe={nprobe}:            {r:.2f}")
    for nprobe, sl in ((1, 50), (2, 100), (4, 100), (4, 200)):
        r = rec([(q, {x.vec_id for x in
                      ivfpq_topk(emb, qvec[q], k=k, nprobe=nprobe,
                                 shortlist=sl).collect()})
                 for q in qids])
        print(f"  ivfpq_topk     nprobe={nprobe} shortlist={sl:<3}: {r:.2f}")
    from scespet_spark.operators.similarity import opq_adc_topk, pq_adc_topk
    for fn, name in ((pq_adc_topk, "pq_adc_topk"),
                     (opq_adc_topk, "opq_adc_topk")):
        for sl in (50, 100):
            r = rec([(q, {x.vec_id for x in
                          fn(emb, qvec[q], k=k, shortlist=sl).collect()})
                     for q in qids])
            print(f"  {name:<14} shortlist={sl:<3}:          {r:.2f}")
    model = pca_fit(emb)
    red = (pca_project(emb, model, k=32, out="p32")
           .select("vec_id", "label",
                   F.col("p32").alias("embedding"))).persist()
    qred = {q: red.filter(F.col("vec_id") == q).collect()[0].embedding
            for q in qids}
    orig = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("v"))
    for nprobe, sl in ((2, 100), (4, 100)):
        got_sets = []
        for q in qids:
            cand = ivfpq_topk(red, qred[q], k=50, nprobe=nprobe,
                              shortlist=sl, m=8, dsub=4)
            qv = F.array(*[F.lit(float(x)) for x in qvec[q]])
            rr = (cand.select("vec_id").join(orig, "vec_id")
                  .select("vec_id",
                          F.round(cosine(F.col("v"), qv), 6)
                          .alias("score"))
                  .orderBy(F.desc("score"), "vec_id").limit(k))
            got_sets.append((q, {x.vec_id for x in rr.collect()}))
        print(f"  pca32->ivfpq   nprobe={nprobe} shortlist={sl:<3}: "
              f"{rec(got_sets):.2f}")
    emb.unpersist()
    red.unpersist()


def aniso_opq_recall(spark, n=2000, k=10, qids=(3, 77, 500, 901, 1500)):
    """PQ vs OPQ recall@k on the ANISOTROPIC fixture (planted clusters
    x per-dim exponential variance decay x a fixed random rotation —
    the tests' `_aniso_embeddings` recipe): the regime where the
    axis-aligned subspace split leaks cross-dimension correlation and
    OPQ's learned rotation exists.  Also prints reconstruction MSE —
    the quantity OPQ optimizes directly."""
    from scespet_spark.operators.similarity import (opq_adc_topk,
                                                    opq_train,
                                                    pq_adc_topk, pq_train)
    from scespet_spark.sources.batch import planted_embeddings

    emb = planted_embeddings(spark, n=n, centers=10, seed=5)
    rng = np.random.default_rng(11)
    scale = np.exp(-np.arange(64) / 16.0)
    Q, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = np.stack([r.embedding for r in rows]) * scale @ Q.T
    df = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in X[i]])
         for i, r in enumerate(rows)],
        "vec_id long, embedding array<double>").persist()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    truth = {q: {int(i) for _, i in
                 sorted(zip(-np.round(Xn @ Xn[q], 6), range(n)))[:k]}
             for q in qids}
    qvec = {q: [float(x) for x in X[q]] for q in qids}

    def rec(fn, sl):
        return sum(len({x.vec_id for x in
                        fn(df, qvec[q], k=k, shortlist=sl).collect()}
                       & truth[q]) / k for q in qids) / len(qids)

    def mse(codes_df, cents_df, R=None):
        codes = {(r.vec_id, r.sub): r.code for r in codes_df.collect()}
        cents = {(r.sub, r.code): np.array(r.c)
                 for r in cents_df.collect()}
        Xr = X @ R.T if R is not None else X
        return sum(float(((Xr[v, s * 8:(s + 1) * 8]
                           - cents[(s, c)]) ** 2).sum())
                   for (v, s), c in codes.items()) / n

    pq_codes, pq_cents = pq_train(df)
    oc, ok_, orot = opq_train(df)
    R = np.stack([np.array(r.w) for r in
                  sorted([r for r in orot.collect() if r.idx >= 0],
                         key=lambda r: r.idx)])
    print(f"anisotropic fixture (n={n}, exp-decay x random rotation): "
          f"recall@{k} + recon MSE")
    print(f"  recon MSE       pq={mse(pq_codes, pq_cents):.6f}  "
          f"opq={mse(oc, ok_, R=R):.6f}")
    for sl in (50, 100, 200):
        print(f"  pq_adc_topk    shortlist={sl:<3}: "
              f"{rec(pq_adc_topk, sl):.2f}")
        print(f"  opq_adc_topk   shortlist={sl:<3}: "
              f"{rec(opq_adc_topk, sl):.2f}")
    df.unpersist()


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark(app_name="embedding-recall", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    base = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding").collect())
    rng = np.random.default_rng(7)

    rows, truth = [], []  # truth: (orig_id, var_id, achieved_cosine)
    for r in base:
        v = np.asarray(r.embedding, dtype="float64")
        vn = v / np.linalg.norm(v)
        oid = r.vec_id * 10
        rows.append((oid, [float(x) for x in v]))
        for j, sigma in enumerate((0.05, 0.15, 0.3, 0.5), start=1):
            w = vn + rng.normal(0, sigma / np.sqrt(len(v)), len(v))
            cos = float(vn @ (w / np.linalg.norm(w)))
            vid = oid + j
            rows.append((vid, [float(x) for x in w]))
            truth.append((oid, vid, cos))

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocks = {r.vec_id: r.block
              for r in embedding_block_table(df, bits=6).collect()}

    bands = [(0.99, 1.01), (0.95, 0.99), (0.9, 0.95), (0.8, 0.9),
             (0.6, 0.8)]
    print("sign-LSH (bits=6) block recall vs achieved cosine:")
    for lo, hi in bands:
        pairs = [(a, b) for a, b, c in truth if lo <= c < hi]
        if not pairs:
            continue
        hit = sum(blocks[a] == blocks[b] for a, b in pairs)
        print(f"  cosine [{lo:.2f}, {hi:.2f}): recall "
              f"{hit / len(pairs):.2f}  (n={len(pairs)})")
    planted_recall(spark)
    aniso_opq_recall(spark)


if __name__ == "__main__":
    main(*sys.argv[1:])
