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


if __name__ == "__main__":
    main(*sys.argv[1:])
