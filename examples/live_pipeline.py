#!/usr/bin/env python
"""One expression, two modes — the reference's central contract
(stubs/src/gsa/esg/mekon/core/EventSource.java:3-6): the SAME verbs run
over historic data as a batch plan and over a live source as a
Structured Streaming plan, ending in a durable checkpointed sink.

This walkthrough builds one pipeline (filter purchases → key by user →
daily windows → reduce), runs it batch and live over the same events,
shows the results agree, then writes the live result to a checkpointed
parquet sink and proves a restart is exactly-once.

Run: ``python examples/live_pipeline.py [sf_dir] [out_dir]``.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scespet_spark import Every, get_spark
from scespet_spark.sources.batch import events_stream
from scespet_spark.streaming.live import LiveStream


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str | None = None,
         run_capstone: bool = True) -> tuple[int, int]:
    spark = get_spark(cpus=8)
    out_dir = out_dir or tempfile.mkdtemp(prefix="live_pipeline_")

    # -- the pipeline, batch mode ------------------------------------
    batch = (events_stream(spark, sf_dir)
             .filter(F.col("event_type") == "purchase")
             .by("user_id", name="user_id")
             .group(Every("1 day"))
             .reduce(total=F.sum("value"), n=F.count("*")))
    n_batch = batch.df.count()
    print(f"batch rows: {n_batch}")

    # -- the SAME pipeline, live mode --------------------------------
    live = (LiveStream.from_events(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .by("user_id")
            .group(Every("1 day"))
            .reduce(total=F.sum("value"), n=F.count("*")))
    got = live.run("complete")
    n_live = got.count()
    print(f"live rows:  {n_live} (modes agree: {n_live == n_batch})")

    # -- durable output: checkpointed sink, exactly-once restart -----
    out, ckpt = f"{out_dir}/purchases", f"{out_dir}/ckpt"
    raw = (LiveStream.from_events(spark, sf_dir)
           .filter(F.col("event_type") == "purchase"))
    raw.to_parquet(out, ckpt)
    n1 = spark.read.parquet(out).count()
    # a restart against the same checkpoint replays nothing
    (LiveStream.from_events(spark, sf_dir)
     .filter(F.col("event_type") == "purchase")).to_parquet(out, ckpt)
    n2 = spark.read.parquet(out).count()
    print(f"sink rows after run 1: {n1}, after restart: {n2} "
          f"(exactly-once: {n1 == n2})")

    # -- r6 verbs: a K->K2 keyed-bucket join and a separate-stream
    # gate, both as streaming plans (the CEP shapes that used to be
    # batch-only) ----------------------------------------------------
    src = LiveStream.from_events(spark, sf_dir)
    purchases = (src.filter(F.col("event_type") == "purchase")
                 .map(xv=F.col("value")).by("user_id"))
    clicks = (src.filter(F.col("event_type") == "click")
              .map(bucket=F.col("user_id") % 5, yv=F.col("value"))
              .by("bucket"))
    km = purchases.take(clicks, ["xv"], ["yv"],
                        key_map=F.col("user_id") % 5).run("append")
    print(f"live keymap take emissions: {km.count()}")

    src2 = LiveStream.from_events(spark, sf_dir)
    data = src2.filter(F.col("event_type") == "purchase").by("user_id")
    gate = (src2.filter(F.col("event_type") == "click")
            .map(g=F.col("value") >= 100).by("user_id"))
    wf = data.window_from(gate, "g", "value", quantize=100).run("append")
    print(f"live window_from closed windows: {wf.count()}")

    # -- r6 crawl gate: every snapshot artifact applied to ONE live
    # document stream — segment election against the prior corpus's
    # digest table, then the CCNet perplexity gate from the snapshot
    # LM + threshold (zero corpus passes on the hot path) ------------
    from scespet_spark.operators.dedup import segment_digests
    from scespet_spark.operators.text import (bigram_lm_apply,
                                              bigram_lm_model,
                                              bigram_lm_score)
    from scespet_spark.sources.batch import load_table
    from scespet_spark.streaming.live import (first_wins,
                                              read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 3 == 0)          # kept corpus
    seg_table = segment_digests(prior).select("__d").distinct()
    lm = bigram_lm_model(prior)
    thr = (bigram_lm_score(prior)
           .agg(F.percentile(F.col("mean_logp"), F.lit(0.1)))
           .collect()[0][0])
    crawl = read_table_stream(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 3 != 0)
    novel = first_wins(
        segment_digests(crawl).join(seg_table, "__d", "left_anti")
        .select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"),
                F.col("__d").alias("segment_hash")),
        keys=["segment_hash"], order_cols=["doc_id", "seg_idx"],
        payload_cols=["doc_id", "seg_idx"])
    n_novel = run_available_now(novel, "append").count()
    kept = run_available_now(
        bigram_lm_apply(crawl, lm).filter(F.col("mean_logp") >= F.lit(thr)),
        "complete").count()
    print(f"live crawl gate: {n_novel} novel segments elected, "
          f"{kept} docs pass the snapshot perplexity gate")

    # -- r8 capstone: the full continuous-crawl loop (opt-out: the
    # test suite exercises the capstone once via its dedicated test;
    # running it twice doubled the suite's longest test for no
    # additional coverage)
    if run_capstone:
        crawl_capstone(spark, sf_dir, out_dir + "/capstone")
    return n_batch, n_live


#: capstone gate parameters: substring gram length, split recipe,
#: classifier bucket counts, snapshot probe buckets
_CAP_L = 15
_CAP_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_CAP_QB = 512      # quality-classifier buckets
_CAP_LB = 512      # language-classifier buckets
_CAP_PROBE_BUCKETS = 8
#: engineered drop-1 rows: one doc whose URL the pre-fetch rule gate
#: must block, one repetition-spam doc the Gopher repetition gate must
#: kill after it clears the URL and content gates
_CAP_BLOCKED_ID = 95002
_CAP_SPAM_ID = 95003
#: per-host domain cap (stage 1b): normal hosts sit well under this,
#: the engineered whale host exceeds it
_CAP_HOST_K = 60
_CAP_WHALE_N = 80          # drop-1 whale pages (> _CAP_HOST_K)
_CAP_WHALE_BASE = 300000   # whale doc_id range (unique URLs)


def _cap_url():
    """Deterministic crawl URL: heavy spelling-variant collisions for
    ids < 90000 (the dedup-worthy web), unique URLs above (the slot the
    engineered duplicate uses so it reaches the CONTENT gate); the
    engineered blocked row carries a URL-keyword hit.  Hosts are
    per-language subdomains (a handful of ordinary hosts, each far
    below the domain cap) except the engineered WHALE host, whose
    unique-URL pages exceed ``_CAP_HOST_K`` and must be capped at
    stage 1b."""
    tail = F.when(F.col("doc_id") >= 90000,
                  F.col("doc_id").cast("string")) \
        .otherwise((F.col("doc_id") % 50).cast("string"))
    return F.when(
        F.col("doc_id") == _CAP_BLOCKED_ID,
        F.lit(f"https://WWW.en.Example.com/en/casino/p{_CAP_BLOCKED_ID}")
    ).when(
        F.col("doc_id") >= _CAP_WHALE_BASE,
        F.concat(F.lit("https://whale.example.com/p"),
                 F.col("doc_id").cast("string"))
    ).otherwise(F.concat(
        F.lit("https://WWW."), F.col("lang"), F.lit(".Example.com/"),
        F.col("lang"), F.lit("/p"), tail,
        F.when(F.col("doc_id") % 2 == 0, F.lit("/?utm_source=feed"))
        .otherwise(F.lit(""))))


def _cap_stage1(spark, drops_dir: str, out: str, ckpt: str) -> None:
    """Crawl gate stage 1: pre-fetch URL RULE gate (FineWeb-style —
    blocked before any content cost; stateless map-only), then the
    URL-canonical first-wins election.  One checkpointed append query;
    re-running after a new drop lands processes ONLY the new files,
    and the election state persists across drops (a later spelling
    variant of an already-seen canonical URL never re-emits)."""
    from scespet_spark.operators.dedup import canonical_url, url_rule_filter
    from scespet_spark.streaming.live import first_wins, write_parquet
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("maxFilesPerTrigger", 1).parquet(drops_dir)
              .withColumn("url", _cap_url()))
    stream = (url_rule_filter(stream)
              .filter(F.col("url_reason").isNull())
              .drop("host", "url_reason")
              .withColumn("canon_url", canonical_url(F.col("url")))
              .drop("url")
              .filter(F.col("canon_url").isNotNull()))
    survivors = first_wins(stream, keys=["canon_url"],
                           order_cols=["doc_id"],
                           payload_cols=["doc_id", "text", "lang",
                                         "source"],
                           t="doc_id")
    write_parquet(survivors, out, ckpt)


def _cap_stage1b(spark, stage1_out: str, out: str, ckpt: str) -> None:
    """Crawl gate stage 1b: the per-host DOMAIN CAP (FineWeb-style
    diversity limit) as its own checkpointed election — once a host
    has contributed ``_CAP_HOST_K`` pages, every later page of that
    host, in this drop or any future one, is suppressed for the cost
    of one state lookup (state per key is ONE counter).  Stateful
    elections each get their own stage: chaining two
    applyInPandasWithState operators inside one streaming query is the
    unsupported shape, and separate checkpoints let each election
    resume independently."""
    from scespet_spark.streaming.live import cap_first_k, write_parquet
    # no maxFilesPerTrigger here (r13): the upstream election writes
    # one file PER OUTPUT PARTITION per drop, and chopping those into
    # one-file micro-batches multiplied the batch count stage-over-
    # stage (stage 2 ran ~12 micro-batches per drop, ~10s each).  The
    # capstone invokes each stage once per drop, so "all files new
    # since the checkpoint" IS the drop — one micro-batch per drop,
    # the documented per-drop election semantics
    stream = (spark.readStream
              .schema("canon_url string, doc_id long, text string, "
                      "lang string, source string")
              .parquet(stage1_out)
              .withColumn("host", F.regexp_extract(
                  F.col("canon_url"), r"^[a-z0-9+.-]+://([^/]+)", 1)))
    capped = cap_first_k(stream, _CAP_HOST_K, keys=["host"],
                         order_cols=["doc_id"],
                         payload_cols=["canon_url", "doc_id", "text",
                                       "lang", "source"],
                         t="doc_id")
    write_parquet(capped, out, ckpt)


def _cap_gate_chain(df, snap, qc_model, lang_model, thr, blooms=None):
    """The capstone's per-drop gate chain on ANY input frame — the
    streaming stage-2 runs it per micro-batch, and the test reads the
    identical BATCH plan to assert the bucketed snapshot sides join
    with zero Exchange.  Stages:

      * known-passage signal: substring gram probe (left-semi vs the
        snapshot ``grams`` table);
      * WIDE exact-content anti-join (digest-width discipline: both
        independent digests — a narrow 60-bit collision with the prior
        corpus would silently kill an innocent crawl doc);
      * Gopher repetition gate (map-only ``array_distinct`` rules —
        repetition spam dies before any model scoring);
      * append-legal language gate (``lang_id_apply_rowwise`` — the
        r9 serving form: literal weight matrix, map-only);
      * append-legal quality gate (row-wise classifier, calibrated
        threshold);
      * deterministic split assignment.

    ``blooms`` (r10: the snapshot's ``read_bloom`` dicts for "grams" /
    "digests") front-loads both snapshot probes with the map-side
    membership test: gram occurrences the sketch rules out of the
    corpus skip the semi-join (definitely not known passages), and
    definitely-novel content digests bypass the anti-join — the
    stream-static joins then carry only the residue per micro-batch.
    Output row-identical at any fpp (no false negatives; positives
    resolve exactly).

    Returns ``(sig, sharded)``."""
    from scespet_spark.operators.bloom import bloom_attach
    from scespet_spark.operators.dedup import digest_cols, gram_digests
    from scespet_spark.operators.pipeline import split_assign
    from scespet_spark.operators.text import (
        gopher_repetition_filter, lang_id_apply_rowwise,
        quality_classifier_apply_rowwise)
    occ = gram_digests(df, min_len=_CAP_L, wide=True)
    if blooms and "grams" in blooms:
        occ = (bloom_attach(occ, blooms["grams"], "__g")
               .filter(F.col("__bloom_maybe")).drop("__bloom_maybe"))
    sig = (occ.join(snap["grams"], ["__g", "__g2"], "left_semi")
           .select("doc_id", "pos"))
    d1, d2 = digest_cols(F.col("text"), wide=True)
    hashed = (df.withColumn("content_hash", d1)
              .withColumn("content_hash2", d2))
    pri = snap["digests"].select("content_hash", "content_hash2")
    if blooms and "digests" in blooms:
        att = bloom_attach(hashed, blooms["digests"], "content_hash")
        maybe = att.filter(F.col("__bloom_maybe")).drop("__bloom_maybe")
        novel = att.filter(~F.col("__bloom_maybe")).drop("__bloom_maybe")
        kept = (maybe.join(pri, ["content_hash", "content_hash2"],
                           "left_anti")
                .unionByName(novel))
    else:
        kept = hashed.join(pri, ["content_hash", "content_hash2"],
                           "left_anti")
    kept = (gopher_repetition_filter(kept).filter(F.col("keep") == 1)
            .drop("dup_line_frac", "dup_2gram_frac", "dup_3gram_frac",
                  "dup_4gram_frac", "keep"))
    langed = (lang_id_apply_rowwise(kept, lang_model, n_buckets=_CAP_LB)
              .filter(F.col("pred_lang") == "en")
              .drop("pred_lang", "score"))
    gated = (quality_classifier_apply_rowwise(langed, qc_model,
                                              n_buckets=_CAP_QB,
                                              threshold=thr)
             .filter(F.col("pred") == 1))
    sharded = split_assign(gated, _CAP_SPLITS).select(
        "doc_id", "text", "lang", "source", "score", "split")
    return sig, sharded


def _cap_stage2(spark, stage1_out: str, snap_dir: str, qc_model,
                lang_model, thr, out: str, ckpt: str, sig_out: str,
                sig_ckpt: str) -> None:
    """Crawl gate stage 2, rebuilt against the CURRENT snapshot and
    the CURRENT models each drop: wide exact-content anti-join vs the
    snapshot digest table, the stateless row-wise language + quality
    gates, deterministic split assignment, then the checkpointed shard
    sink partitioned by split.  Side output: the substring-probe
    signal — every (doc, pos) whose passage the snapshot corpus
    already contains.  Everything here is map-side or stream-static
    (per-micro-batch cost is the arriving docs only, zero corpus
    passes), and the snapshot sides are BUCKETED probe tables — zero
    snapshot-side Exchange per batch."""
    from scespet_spark.operators.snapshot import (check_compat,
                                                  read_bloom,
                                                  read_snapshot)
    from scespet_spark.streaming.live import write_parquet
    check_compat(snap_dir, spark=spark, digest_wide=True,
                 sub_min_len=_CAP_L)
    snap = read_snapshot(spark, snap_dir)
    # r10: rehydrate the snapshot Blooms (written with bloom_fpp=,
    # folded by every generation append) — absent on older snapshots,
    # in which case the gates run plain
    blooms = {}
    for fam in ("digests", "grams"):
        try:
            blooms[fam] = read_bloom(spark, snap_dir, fam)
        except ValueError:
            pass
    # no maxFilesPerTrigger (r13): one micro-batch per drop — see
    # _cap_stage1b
    stream = (spark.readStream
              .schema("canon_url string, doc_id long, text string, "
                      "lang string, source string")
              .parquet(stage1_out))
    sig, sharded = _cap_gate_chain(stream, snap, qc_model, lang_model,
                                   thr, blooms=blooms or None)
    write_parquet(sig, sig_out, sig_ckpt)
    write_parquet(sharded, out, ckpt, partition_by=["split"])


def _cap_models(spark, corpus):
    """Fit the capstone's serving models + calibrated threshold from a
    corpus snapshot — called once per snapshot REFRESH, so the gates
    track the corpus as it grows (the r9 model-refresh step): the
    hashed-feature quality classifier, the char-gram language model,
    and the CCNet-style quantile threshold (keep crawl docs scoring
    above the corpus's 10th percentile — one scalar per snapshot)."""
    from scespet_spark.operators.text import (
        lang_id_fit, quality_classifier_apply_rowwise as _qcr,
        quality_classifier_fit)
    qc_model = quality_classifier_fit(
        corpus.withColumn("label", (F.col("lang") == "en").cast("int")),
        n_buckets=_CAP_QB).cache()
    lang_model = lang_id_fit(corpus, n_buckets=_CAP_LB).cache()
    thr = (_qcr(corpus, qc_model, n_buckets=_CAP_QB)
           .agg(F.percentile(F.col("score"), F.lit(0.1)))
           .collect()[0][0])
    return qc_model, lang_model, thr


def crawl_capstone(spark, sf_dir: str, work: str) -> dict:
    """End-to-end continuous-crawl loop over TWO crawl drops with a
    snapshot AND model refresh in between:

        url_rule_filter (pre-fetch gate, r9)
                  -> url_dedup -> per-host domain cap (late r9)
                  -> substring snapshot probe (signal)
                  -> WIDE exact-content snapshot gate
                  -> Gopher repetition gate (r9)
                  -> language gate (row-wise serving form, r9)
                  -> quality gate (row-wise serving form)
                  -> split_assign -> checkpointed shard sink

    Drop 2 contains an engineered exact duplicate of a drop-1 SURVIVOR
    under a fresh id and unique URL: it sails through the URL gate but
    the refreshed snapshot's digest table (drop-1 survivors APPENDED
    into the standing artifact between drops — write_snapshot
    mode="append", generation lineage in the manifest, cost ∝ the
    drop) kills it at the content gate — the property the refresh
    exists to provide.  The refresh also RE-FITS
    both classifier models and the threshold from the grown corpus
    (prior + drop-1 survivors), and the result records that drop-2
    serving picked up the refreshed weights.  Snapshots are written
    with ``digest_wide=True`` (the content gate anti-joins on both
    digests) and ``bucket_probes`` (zero snapshot-side Exchange per
    micro-batch)."""
    import shutil
    import time as _time
    from scespet_spark.operators.snapshot import write_snapshot
    from scespet_spark.sources.batch import load_table

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    docs = load_table(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 3 == 0)
    qc_model, lang_model, thr = _cap_models(spark, prior)
    drops = f"{work}/drops"
    os.makedirs(drops)
    now = _time.time()

    def stage_drop(df, name, mtime):
        d = f"{work}/_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(d)
        f = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = f"{drops}/{name}.parquet"
        os.replace(f"{d}/{f}", dst)
        shutil.rmtree(d)
        os.utime(dst, (mtime, mtime))

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    s1_out, s1_ck = f"{work}/stage1", f"{work}/ck1"
    s1b_out, s1b_ck = f"{work}/stage1b", f"{work}/ck1b"
    s2_out, s2_ck = f"{work}/corpus", f"{work}/ck2"
    sig_out, sig_ck = f"{work}/signals", f"{work}/ck_sig"

    # ---- snapshot 0 (prior corpus only), drop 1 --------------------
    # bloom_fpp: the probe pre-filter artifacts (r10) — the live gates
    # suppress definitely-novel digests/grams map-side per micro-batch.
    # doc_families (r13, guide §1.2): the capstone gates read the wide
    # digest table and the gram table (+ their Blooms), and the
    # takedown epilogue's band-mate-scoped recall restoration needs the
    # band tombstones — the segment and bigram-LM families were built
    # and then never read, and every generation append/retract/compact
    # maintained them too
    write_snapshot(f"{work}/snap0", docs=prior, sub_min_len=_CAP_L,
                   digest_wide=True, bucket_probes=_CAP_PROBE_BUCKETS,
                   bloom_fpp=0.01,
                   doc_families=("digests", "bands", "grams"))
    # drop 1 carries two engineered rows: a blocked-URL doc (unique
    # URL, but the pre-fetch rule gate must kill it on the keyword)
    # and a repetition-spam doc (clean unique URL, novel content — it
    # must reach and die at the Gopher repetition gate)
    schema = ", ".join(f"{c} {t}" for c, t in
                       [("doc_id", "long"), ("text", "string"),
                        ("lang", "string"), ("source", "string"),
                        ("n_chars", "long")])
    spam_text = "win big now " * 40
    engineered = spark.createDataFrame(
        [(_CAP_BLOCKED_ID, "an ordinary page that never gets fetched",
          "en", "src0", 41),
         (_CAP_SPAM_ID, spam_text, "en", "src0", len(spam_text))],
        schema)
    # the WHALE host: _CAP_WHALE_N unique pages on one domain — every
    # one clears the URL gates (unique URLs, clean host), stage 1b
    # must admit exactly _CAP_HOST_K of them
    whale = (spark.range(_CAP_WHALE_N)
             .select((F.lit(_CAP_WHALE_BASE) + F.col("id"))
                     .alias("doc_id"),
                     F.concat(F.lit("whale landing page number "),
                              F.col("id").cast("string"),
                              F.lit(" alpha beta gamma delta"))
                     .alias("text"),
                     F.lit("en").alias("lang"),
                     F.lit("src0").alias("source"),
                     F.lit(50).alias("n_chars")))
    stage_drop(docs.filter(F.col("doc_id") % 3 == 1).select(*cols)
               .unionByName(engineered).unionByName(whale),
               "drop1", now - 100)
    _cap_stage1(spark, drops, s1_out, s1_ck)
    _cap_stage1b(spark, s1_out, s1b_out, s1b_ck)
    _cap_stage2(spark, s1b_out, f"{work}/snap0", qc_model, lang_model,
                thr, s2_out, s2_ck, sig_out, sig_ck)
    kept1 = spark.read.parquet(s2_out)
    n1 = kept1.count()

    # ---- snapshot + MODEL refresh: prior + drop-1 survivors ---------
    # r10: the probe artifacts refresh by GENERATION APPEND — only the
    # drop-1 survivors' digests are hashed and appended into snap0's
    # standing bucketed tables (cost ∝ the drop, not the corpus; the
    # r9 form rewrote the whole snapshot per drop).  The serving
    # MODELS still refit from the grown corpus — they are optimization
    # artifacts, not digest sets, and refitting is the contract.
    dup_src = kept1.orderBy("doc_id").limit(1).collect()[0]
    corpus1 = (prior.select("doc_id", "text", "lang").unionByName(
        kept1.select("doc_id", "text", "lang")).cache())
    write_snapshot(f"{work}/snap0", docs=kept1.select("doc_id", "text"),
                   mode="append")
    qc_model2, lang_model2, thr2 = _cap_models(spark, corpus1)
    # serving must pick up the refreshed weights: the same crafted doc
    # scores differently under the refreshed quality model
    from scespet_spark.operators.text import (
        quality_classifier_apply_rowwise as _qcr)
    probe = spark.createDataFrame([(0, dup_src["text"])],
                                  "doc_id long, text string")
    s_old = _qcr(probe, qc_model, n_buckets=_CAP_QB).collect()[0]["score"]
    s_new = _qcr(probe, qc_model2, n_buckets=_CAP_QB).collect()[0]["score"]

    # ---- drop 2: fresh docs + an exact dup of a drop-1 survivor ----
    drop2 = docs.filter(F.col("doc_id") % 3 == 2).select(*cols)
    dup_row = spark.createDataFrame(
        [(100001, dup_src["text"], dup_src["lang"], dup_src["source"],
          len(dup_src["text"]))], ", ".join(f"{c} {t}" for c, t in
        [("doc_id", "long"), ("text", "string"), ("lang", "string"),
         ("source", "string"), ("n_chars", "long")]))
    # ...plus three MORE whale pages: their host filled its quota in
    # drop 1, so the cap's counter state must suppress them across the
    # drop boundary for the cost of a state lookup each
    whale2 = (spark.range(3)
              .select((F.lit(_CAP_WHALE_BASE + 100000) + F.col("id"))
                      .alias("doc_id"),
                      F.concat(F.lit("late whale page "),
                               F.col("id").cast("string")).alias("text"),
                      F.lit("en").alias("lang"),
                      F.lit("src0").alias("source"),
                      F.lit(20).alias("n_chars")))
    stage_drop(drop2.unionByName(dup_row).unionByName(whale2),
               "drop2", now - 50)
    _cap_stage1(spark, drops, s1_out, s1_ck)
    _cap_stage1b(spark, s1_out, s1b_out, s1b_ck)
    # drop 2 probes snap0 AGAIN — now carrying the appended drop-1
    # generation, which is what kills the engineered duplicate below
    _cap_stage2(spark, s1b_out, f"{work}/snap0", qc_model2, lang_model2,
                thr2, s2_out, s2_ck, sig_out, sig_ck)

    final = spark.read.parquet(s2_out)
    n2 = final.count()
    ids = {r.doc_id for r in final.select("doc_id").collect()}
    s1_ids = {r.doc_id
              for r in spark.read.parquet(s1_out).select("doc_id").collect()}
    s1b_ids = {r.doc_id for r in
               spark.read.parquet(s1b_out).select("doc_id").collect()}
    n_whale_kept = sum(_CAP_WHALE_BASE <= i < _CAP_WHALE_BASE + 100000
                       for i in s1b_ids)
    splits = {r.split for r in final.select("split").distinct().collect()}
    n_sig = spark.read.parquet(sig_out).count()
    res = {"drop1_kept": n1, "total_kept": n2,
           "dup_suppressed": 100001 not in ids,
           "dup_source_present": dup_src["doc_id"] in ids,
           "splits": sorted(splits), "known_passage_hits": n_sig,
           "model_refreshed": s_old != s_new,
           "probe_scores": (s_old, s_new),
           # the blocked-URL doc dies BEFORE the election (pre-fetch);
           # the spam doc clears the URL gates, then dies at the
           # repetition gate before any model scoring
           "url_blocked_suppressed": _CAP_BLOCKED_ID not in s1_ids,
           "repetition_suppressed": (_CAP_SPAM_ID in s1_ids
                                     and _CAP_SPAM_ID not in ids),
           # the domain cap: all whale pages clear the URL election
           # (unique URLs), stage 1b admits exactly _CAP_HOST_K and
           # the drop-2 stragglers are suppressed by counter state
           "whale_elected": sum(i >= _CAP_WHALE_BASE for i in s1_ids),
           "whale_capped": n_whale_kept,
           "whale_drop2_suppressed": not any(
               i >= _CAP_WHALE_BASE + 100000 for i in s1b_ids)}

    # ---- takedown epilogue (r11): retract the drop-1 survivor whose
    # text seeded the engineered duplicate.  Its digests tombstone out
    # of snap0, so a RE-CRAWL of the same content now probes as novel
    # (the dedup memory is gone), while other kept docs' content stays
    # suppressed; compaction folds the tombstones and the behavior is
    # unchanged.  Cost ∝ the one retracted doc + one digest-table
    # rewrite at compaction — the corpus is never re-read.
    from scespet_spark.operators.dedup import incremental_keep
    from scespet_spark.operators.snapshot import (compact_snapshot,
                                                  read_snapshot,
                                                  retract_snapshot)
    other_src = kept1.orderBy(F.col("doc_id").desc()).limit(1).collect()[0]
    retract_snapshot(f"{work}/snap0",
                     docs=spark.createDataFrame(
                         [(dup_src["doc_id"], dup_src["text"])],
                         "doc_id long, text string"))
    recrawl = spark.createDataFrame(
        [(200001, dup_src["text"]), (200002, other_src["text"])],
        "doc_id long, text string")

    def _fresh_ids():
        dig = read_snapshot(spark, f"{work}/snap0")["digests"]
        return {r.doc_id for r in incremental_keep(
            recrawl, dig, prior_digest_col="content_hash").collect()}
    fresh = _fresh_ids()
    # compaction with the RETAINED corpus: folds the tombstones AND
    # restores fragment digests the takedown shared with retained docs
    # (r12 recall restoration — band-mate scoped, cost ∝ the takedown)
    compact_snapshot(f"{work}/snap0", spark,
                     docs=corpus1.filter(
                         F.col("doc_id") != dup_src["doc_id"])
                     .select("doc_id", "text"))
    res["takedown_readmitted"] = 200001 in fresh
    res["takedown_retained_suppressed"] = 200002 not in fresh
    res["takedown_stable_after_compaction"] = _fresh_ids() == fresh
    print(f"capstone: {n1} docs after drop 1, {n2} total after drop 2; "
          f"engineered duplicate suppressed by the refreshed snapshot: "
          f"{res['dup_suppressed']}; splits {res['splits']}; "
          f"{n_sig} known-passage coordinates signalled; model refresh "
          f"moved the probe score {s_old} -> {s_new}; whale host "
          f"{res['whale_elected']} elected -> {res['whale_capped']} "
          f"capped")
    return res


if __name__ == "__main__":
    main(*sys.argv[1:])
