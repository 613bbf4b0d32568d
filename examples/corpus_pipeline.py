#!/usr/bin/env python
"""End-to-end training-corpus preparation pipeline: the composition a
100 TB data pipeline actually runs, on the driver's synthetic tables.

    dedup (exact + MinHash/LSH clusters)
      -> segment-level boilerplate removal (C4-style line dedup)
      -> exact-substring dedup (suffix-array family, >= 15-token passages)
      -> decontaminate against a benchmark set
      -> quality + repetition + corpus-IDF + perplexity filters
      -> language-ID classifier gate (hashed char-n-gram NB)
      -> DSIR importance resampling toward a target domain
      -> Gopher doc-shape + repetition rule gates
      -> per-host domain cap -> per-source quota cap
      -> per-source token budget
      -> pack into fixed-token training sequences
      -> deterministic shuffle -> partitioned parquet

Every stage is one of this repo's operators; nothing here is
example-only code.  Run: ``python examples/corpus_pipeline.py [sf_dir]``
(default /root/testdata/sf0.001).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scespet_spark import get_spark
from scespet_spark.operators.dedup import (connected_components, exact_groups,
                                           lsh_candidate_pairs)
from scespet_spark.operators.pipeline import (decontaminate, pack_sequences,
                                              shuffle_deterministic)
from scespet_spark.operators.text import (corpus_idf_quality, quality_score,
                                          repetition_stats,
                                          source_quota_sample)
from scespet_spark.sources.batch import load_table, write_partitioned


def main(sf_dir="/root/testdata/sf0.001", out_dir=None):
    spark = get_spark(cpus=8)
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep each content hash's representative
    reps = exact_groups(docs).select(F.col("rep_id").alias("doc_id"))
    docs = docs.join(reps, "doc_id")

    # 2. near-dedup: LSH candidates -> connected components -> keep the
    #    cluster representative (min id)
    clusters = connected_components(lsh_candidate_pairs(docs))
    dupes = clusters.filter(F.col("id") != F.col("cluster")) \
                    .select(F.col("id").alias("doc_id"))
    docs = docs.join(dupes, "doc_id", "left_anti")

    # 2b. segment-level boilerplate removal (C4-style line dedup):
    #     cross-page repeated segments vanish from all but their first
    #     carrier; documents are rewritten to the surviving text
    from scespet_spark.operators.dedup import segment_dedup
    cleaned = segment_dedup(docs, size=10)
    docs = (docs.drop("text", "n_chars")
            .join(cleaned.select("doc_id",
                                 F.col("clean_text").alias("text")),
                  "doc_id"))

    # 2c. exact-substring dedup (the suffix-array family): arbitrary-
    #     offset repeated passages of >= 15 tokens that survived the
    #     aligned-segment pass (cross-doc copies at different offsets)
    #     are cut from all but their first carrier
    from scespet_spark.operators.dedup import substring_dedup
    sub = substring_dedup(docs, min_len=15)
    docs = (docs.drop("text")
            .join(sub.filter(F.col("n_tokens") > F.col("n_removed"))
                  .select("doc_id", F.col("clean_text").alias("text")),
                  "doc_id")
            .withColumn("n_chars", F.length("text"))
            .select("doc_id", "text", "lang", "source", "n_chars")
            # the deduped+cleaned corpus feeds every downstream stage
            # (bench/train split, quality, IDF, LM): checkpoint here so
            # the iterative CC + segment election lineage runs ONCE and
            # the logical plan TRUNCATES (persist alone keeps the
            # nested plan growing until codegen/planning itself blows
            # up) — at a real site this is the post-dedup materialized
            # table
            .localCheckpoint())

    # phase boundary: the LSH/shingle tables the dedup operators
    # persisted internally are dead once the cleaned corpus has
    # materialized — release them here, or a long-lived session
    # accretes one cached table per dedup pass (_cache.py design)
    from scespet_spark.operators.dedup import release_cached as _release_dedup
    _release_dedup()

    # 3. decontamination: drop docs overlapping the benchmark set
    #    (pseudo-benchmark: doc_id % 19 == 0)
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    train = docs.filter(F.col("doc_id") % 19 != 0)
    dirty = decontaminate(train, bench).select("doc_id")
    train = train.join(dirty, "doc_id", "left_anti")

    # 4. quality + repetition filters
    train = (quality_score(train).filter(F.col("quality") >= 0.3)
             .select(*docs.columns))
    rep = repetition_stats(train).filter(
        (F.col("distinct_token_ratio") >= 0.3) | F.col("n_tokens").isNull())
    train = train.join(rep.select("doc_id"), "doc_id")

    # 4b. corpus-frequency filter: drop boilerplate-vocabulary docs
    #     (low mean IDF = the doc is made of the corpus's most common
    #     tokens) -- two corpus passes, text never shuffles
    idf = corpus_idf_quality(train).filter(F.col("mean_idf") >= 0.01)
    train = train.join(idf.select("doc_id"), "doc_id")

    # 4b2. perplexity filter (CCNet): drop the tail of docs whose token
    #      transitions the in-corpus bigram LM finds most surprising.
    #      The LM traverses its input several times (bigram counts,
    #      prefix counts, vocabulary) — persist first so those passes
    #      read the filtered corpus, not the whole dedup/CC lineage
    from scespet_spark.operators.text import perplexity_filter
    train = train.localCheckpoint()   # truncate before the LM's passes
    lm_kept = perplexity_filter(train, frac=0.05)
    train = train.join(lm_kept.select("doc_id"), "doc_id")

    # 4b3. language gate (r8): the CCNet-style hashed char-n-gram NB
    #      classifier annotates every doc; keep the target language.
    #      (On this synthetic corpus text is lang-independent, so the
    #      classifier converges to the majority class — the gate is
    #      exercised, not load-bearing, here.)
    from scespet_spark.operators.text import lang_id_apply, lang_id_fit
    lmodel = lang_id_fit(train.limit(200), n_buckets=1024)
    preds = lang_id_apply(train, lmodel, n_buckets=1024)
    train = train.join(preds.filter(F.col("pred_lang") == "en")
                       .select("doc_id"), "doc_id")

    # 4b4. DSIR selection (r8): resample the corpus toward a target
    #      domain sample via hashed-n-gram importance weights +
    #      deterministic Gumbel top-k (keep ~90%)
    from scespet_spark.operators.pipeline import dsir_sample
    tgt = docs.filter(F.col("doc_id") % 17 == 0)
    keep_k = max(1, int(train.count() * 0.9))
    train = train.join(dsir_sample(train, tgt, k=keep_k)
                       .select("doc_id"), "doc_id")

    # 4b5. Gopher rule gates (r9): doc-shape rules + within-doc
    #      repetition rules — two map-only codegen projections; audit
    #      columns dropped once the gate has fired
    from scespet_spark.operators.text import (gopher_quality_filter,
                                              gopher_repetition_filter)
    # min_stop_hits=0: the synthetic vocabulary carries no English
    # stop words, so Gopher's required-stop-words rule would empty the
    # corpus here; the shape rules stay load-bearing
    train = (gopher_quality_filter(train, min_words=10, min_stop_hits=0)
             .filter(F.col("keep") == 1).select(*docs.columns))
    train = (gopher_repetition_filter(train)
             .filter(F.col("keep") == 1).select(*docs.columns))

    # 4b3. per-host domain cap (late r9): FineWeb-style diversity —
    #      at most 40 docs per (synthetic) host, best-first; the salted
    #      two-phase form is the whale-safe plan (see cap_per_key)
    from scespet_spark.operators.pipeline import cap_per_key
    train = (cap_per_key(
        train.withColumn("host", F.concat(
            F.lit("h"), (F.col("doc_id") % 13).cast("string"),
            F.lit(".example.org"))),
        40, "host", [F.col("n_chars").desc(), F.col("doc_id").asc()],
        salt=4)
        .select(*docs.columns))

    # 4c. per-source quota: cap any single source's share of the mix
    #     (deterministic hash order; prefiltered to O(quota)/source)
    train = source_quota_sample(train, quota=200)

    # 4c2. per-source TOKEN budget (r9): spend each source's epoch
    #      budget on its best docs first — the unit training mixes
    #      actually allocate
    from scespet_spark.operators.text import token_budget_sample
    train = (token_budget_sample(train, budget=150,
                                 priority_col="n_chars")
             .select(*docs.columns))

    # the kept corpus feeds packing (3 references in the final plan) and
    # the step-7 snapshot builds: checkpoint it so the dedup/filter
    # lineage runs once, not once per consumer, and downstream plans
    # start from a flat scan
    train = train.localCheckpoint()

    # 5. pack into 512-token training sequences (concat-and-chunk)
    packed = pack_sequences(train, budget=512)

    # 6. deterministic shuffle + partitioned write
    final = (packed.join(shuffle_deterministic(train, seed="1"), "doc_id")
             .join(train.select("doc_id", "text"), "doc_id"))
    out_dir = out_dir or os.path.join(tempfile.gettempdir(), "corpus_out")
    write_partitioned(final, out_dir, partition_cols=("shard",),
                      sort_within=("sort_key",))

    n1 = final.count()
    print(f"corpus: {n0} docs in -> {n1} packed/shuffled docs out ({out_dir})")

    # 7. the CONTINUOUS build: a second crawl lands and dedups against
    #    the kept corpus's digest snapshot (exact) + its LSH band table
    #    (near) — neither pass re-reads the kept corpus's text
    from scespet_spark.operators.dedup import (banded_signatures,
                                               incremental_keep,
                                               incremental_near_dup)
    from scespet_spark.operators.hashing import h64
    # the snapshot artifacts are built ONCE from the kept corpus and
    # persisted (at a real site: written to storage) — the two probe
    # counts below reuse them instead of re-running the whole filter
    # lineage per action
    snapshot = train.select(h64(F.col("text")).alias("d")).persist()
    band_table = banded_signatures(train).persist()
    recrawl = (load_table(spark, sf_dir, "documents")
               .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    fresh = incremental_keep(recrawl, snapshot, prior_digest_col="d")
    near = incremental_near_dup(recrawl, None, prior_bands=band_table)
    print(f"second crawl: {recrawl.count()} docs -> "
          f"{fresh.count()} exact-fresh, {near.count()} near-dup suspects")

    # 7a. segment-level continuation: the snapshot's segment-digest
    #     table suppresses boilerplate the kept corpus already carries
    from scespet_spark.operators.dedup import (incremental_segment_dedup,
                                               segment_digests)
    seg_table = segment_digests(train).select("__d").distinct().persist()
    seg_clean = incremental_segment_dedup(recrawl, prior_segments=seg_table)
    print(f"segment probe: {seg_clean.count()} second-crawl docs keep "
          f"novel text after snapshot-segment suppression")

    # 7b. the snapshot's LM model scores the second crawl without
    #     re-fitting: unseen transitions fall back to smoothing mass
    from scespet_spark.operators.text import bigram_lm_apply, bigram_lm_model
    lm = tuple(t.persist() for t in bigram_lm_model(train))  # snapshot
    crawl_scores = bigram_lm_apply(recrawl, lm)
    n_flagged = crawl_scores.filter(F.col("mean_logp") < -9).count()
    print(f"snapshot LM flagged {n_flagged} second-crawl docs "
          f"below the -9 logp floor")

    # 8. the embedding index keeps up the same way: the IVF centroids
    #    are the snapshot's model artifact; a new embedding batch
    #    assigns to the EXISTING cells map-side (no retraining, no
    #    corpus reshuffle) and appends to the codes table, which
    #    serving probes directly
    from scespet_spark.operators.similarity import (ivf_assign,
                                                    ivf_topk_from_index,
                                                    label_centroids)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(emb).persist()          # snapshot artifact
    codes = ivf_assign(emb, cents).persist()        # snapshot artifact
    new_emb = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    codes2 = codes.unionByName(ivf_assign(new_emb, cents))  # append-only
    qv = emb.limit(1).select("embedding").collect()[0][0]
    hits = ivf_topk_from_index(emb.unionByName(new_emb), codes2, cents,
                               qv, k=5, nprobe=2)
    print(f"index after append: {codes2.count()} codes; "
          f"top-5 probe ids: {[r.vec_id for r in hits.collect()]}")

    # final phase boundary: every snapshot artifact has served its
    # probes — drop the explicit persists AND whatever the operator
    # families registered, so the session ends with no cached blocks
    # (the localCheckpoint tables are source data, not cache)
    released = [snapshot, band_table, seg_table, *lm, cents, codes]
    for tbl in released:
        tbl.unpersist()
    from scespet_spark.operators.similarity import (
        release_cached as _release_sim)
    _release_dedup()
    _release_sim()
    leftover = [t for t in released if t.storageLevel.useMemory]
    print(f"cache: {len(leftover)} persisted tables left after release")
    return n0, n1


if __name__ == "__main__":
    main(*sys.argv[1:])
    from scespet_spark import get_spark
    get_spark(cpus=8).stop()
