#!/usr/bin/env python
"""Deep fuzz of the Bloom-probe row-identity claim — beyond the CI
property tests' example budget: random corpora (duplicate-heavy,
disjoint, empty-overlap, unicode, repeated-token), random filter
geometry (right-sized through pathologically undersized), narrow and
WIDE digests, with/without residue broadcast, across all three exact
probes.  Any mismatch prints the reproducing seed and exits nonzero.

Run: python tools/fuzz_bloom.py [iterations] [seed]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scespet_spark import get_spark  # noqa: E402
from scespet_spark.operators.bloom import bloom_build, bloom_dense  # noqa: E402
from scespet_spark.operators.dedup import (exact_groups,  # noqa: E402
                                           gram_digests,
                                           incremental_keep,
                                           incremental_segment_dedup,
                                           incremental_substring_dedup,
                                           segment_digests)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho",
         "tau", "phi", "chi", "psi", "omega", "naïve", "héllo", "世界"]


def rand_doc(rng, n_lo=1, n_hi=14):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(n_lo, n_hi)))


def rand_corpus(rng, spark, n, base_id, dup_frac=0.0, pool=None):
    rows = []
    for i in range(n):
        if pool and rng.random() < dup_frac:
            t = rng.choice(pool)
        else:
            t = rand_doc(rng)
        rows.append((base_id + i, t))
    return (spark.createDataFrame(rows, "doc_id long, text string"),
            [t for _, t in rows])


def run_case(spark, rng, it):
    n_prior = rng.randint(1, 25)
    n_new = rng.randint(1, 40)
    prior, ptexts = rand_corpus(rng, spark, n_prior, 1000)
    new, _ = rand_corpus(rng, spark, n_new, 0,
                         dup_frac=rng.choice([0.0, 0.3, 0.9]),
                         pool=ptexts)
    wide = rng.random() < 0.4
    fpp = rng.choice([0.01, 0.3, 0.7])
    n_items = rng.choice([1, max(1, n_prior // 2), n_prior * 3])
    rb = rng.random() < 0.7

    def mk_bloom(keys_df, col):
        w, m, k = bloom_build(keys_df, col, n_items=n_items, fpp=fpp)
        return {"m": m, "k": k, "words": bloom_dense(w, m),
                "residue_broadcast": rb}

    fam = it % 3
    if fam == 0:
        dig = exact_groups(prior, wide=wide)
        cols = [c for c in ("content_hash", "content_hash2")
                if c in dig.columns]
        pri = dig.select(*cols)
        bloom = mk_bloom(pri, "content_hash")
        plain = sorted(map(tuple, incremental_keep(
            new, pri, prior_digest_col=cols, wide=wide).collect()))
        fast = sorted(map(tuple, incremental_keep(
            new, pri, prior_digest_col=cols, wide=wide,
            prior_bloom=bloom).collect()))
    elif fam == 1:
        size = rng.choice([2, 3, 5])
        segs = (segment_digests(prior, size=size, wide=wide)
                .select(*(["__d", "__d2"] if wide else ["__d"]))
                .distinct())
        if segs.count() == 0:
            return True
        bloom = mk_bloom(segs, "__d")
        plain = sorted(map(tuple, incremental_segment_dedup(
            new, prior_segments=segs, size=size, wide=wide).collect()))
        fast = sorted(map(tuple, incremental_segment_dedup(
            new, prior_segments=segs, size=size, wide=wide,
            prior_bloom=bloom).collect()))
    else:
        L = rng.choice([2, 3, 4])
        grams = (gram_digests(prior, min_len=L, wide=wide)
                 .select(*(["__g", "__g2"] if wide else ["__g"]))
                 .distinct())
        if grams.count() == 0:
            return True
        bloom = mk_bloom(grams, "__g")
        plain = sorted(map(tuple, incremental_substring_dedup(
            new, prior_grams=grams, min_len=L, wide=wide).collect()))
        fast = sorted(map(tuple, incremental_substring_dedup(
            new, prior_grams=grams, min_len=L, wide=wide,
            prior_bloom=bloom).collect()))
    if plain != fast:
        print(f"MISMATCH it={it} fam={fam} wide={wide} fpp={fpp} "
              f"n_items={n_items} rb={rb}")
        print("plain:", plain[:5])
        print("fast :", fast[:5])
        return False
    return True


def main(iters=60, seed=2026):
    iters, seed = int(iters), int(seed)
    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    for it in range(iters):
        if not run_case(spark, rng, it):
            sys.exit(1)
        if (it + 1) % 10 == 0:
            print(f"{it + 1}/{iters} cases row-identical", flush=True)
    print(f"OK: {iters} randomized cases, all three probes row-identical")


if __name__ == "__main__":
    main(*sys.argv[1:])
