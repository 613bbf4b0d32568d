#!/usr/bin/env python
"""Measure MinHash-LSH candidate *recall* against exact shingle-Jaccard
ground truth — the tuning evidence for the (num_hashes, bands) choice.

Builds a near-dup-dense corpus (each sf0.01 document plus variants with
every 3rd/5th/10th token dropped — Jaccard ~0.5-0.9 vs the original),
computes exact 3-gram Jaccard for ALL pairs driver-side (the corpus is
small; ground truth is the one place all-pairs is acceptable), then runs
``lsh_candidate_pairs`` and reports, per Jaccard threshold, what
fraction of true pairs LSH surfaced.

The S-curve theory for b bands of r rows: P(candidate) =
1 - (1 - J^r)^b; with the defaults (16 hashes, 4 bands of 4) the 50%
threshold sits at (1/4)^(1/4) ~= 0.707 — pairs well above .7 should be
caught nearly always, pairs below .5 mostly not (that is the point:
they are not near-dups).

Usage: python tools/lsh_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from scespet_spark import get_spark  # noqa: E402
from scespet_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs, release_cached)


def shingle_set(text: str, n: int = 3) -> frozenset:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < n:
        return frozenset([" ".join(toks)]) if toks else frozenset()
    return frozenset(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_spark(app_name="lsh-recall", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").collect())

    rows = []
    for r in base:
        rows.append((r.doc_id * 10, r.text))
        toks = r.text.split(" ")
        for j, k in enumerate((3, 5, 10), start=1):
            kept = " ".join(t for i, t in enumerate(toks) if i % k != k - 1)
            rows.append((r.doc_id * 10 + j, kept))

    # exact ground truth, driver-side (all-pairs is fine at this size
    # and ONLY here — the engine itself never does this)
    sets = {i: shingle_set(t) for i, t in rows}
    ids = sorted(sets)
    truth = {}
    for a in range(len(ids)):
        sa = sets[ids[a]]
        for b in range(a + 1, len(ids)):
            sb = sets[ids[b]]
            inter = len(sa & sb)
            if inter:
                j = inter / (len(sa) + len(sb) - inter)
                if j >= 0.3:
                    truth[(ids[a], ids[b])] = j

    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = {(r.id_a, r.id_b)
            for r in lsh_candidate_pairs(df).collect()}
    release_cached()

    report = {"n_docs": len(rows), "n_candidates": len(cand)}
    for thr in (0.5, 0.6, 0.7, 0.8, 0.9):
        tp = [p for p, j in truth.items() if j >= thr]
        hit = sum(1 for p in tp if p in cand)
        report[f"recall@J>={thr}"] = round(hit / len(tp), 4) if tp else None
        report[f"n_true@J>={thr}"] = len(tp)
    # candidate precision vs a 0.5 floor (how much verify work is waste)
    good = sum(1 for p in cand if truth.get(p, 0.0) >= 0.5)
    report["precision@J>=0.5"] = round(good / len(cand), 4) if cand else None
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:])
