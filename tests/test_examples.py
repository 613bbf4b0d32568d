"""The examples are operator compositions users copy — keep them
running against the real testdata."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

SF = "/root/testdata/sf0.001"


def test_corpus_pipeline_example(spark, tmp_path, capsys):
    import corpus_pipeline
    # delta-based leak check: assert the EXAMPLE releases every family
    # it touches, without failing on registry residue an earlier suite
    # member left behind (those have their own release discipline)
    from scespet_spark.operators._cache import _REGISTRY
    pre = {fam: len(dfs) for fam, dfs in _REGISTRY.items()}
    n_in, n_out = corpus_pipeline.main(SF, out_dir=str(tmp_path / "out"))
    assert n_in == 500 and 0 < n_out <= n_in
    # (folded from the former test_pipeline_ops duplicate, which re-ran
    # the whole pipeline a second time): the sink carries the packed
    # sequence columns
    got = spark.read.parquet(str(tmp_path / "out"))
    assert {"doc_id", "seq_first", "sort_key", "text"} <= set(got.columns)
    # cache-release discipline: every explicitly persisted snapshot
    # table AND every operator-family cache must be released at the
    # phase boundaries (localCheckpoint lineage-truncation tables are
    # source data, not cache, and are exempt)
    assert "cache: 0 persisted tables left" in capsys.readouterr().out
    leaked = {fam: len(dfs) for fam, dfs in _REGISTRY.items()
              if len(dfs) > pre.get(fam, 0)}
    assert not leaked, f"example leaked cache families: {leaked}"


def test_ann_search_example(spark, capsys):
    import ann_search
    ann_search.main(SF)
    out = capsys.readouterr().out
    assert "recall@10" in out
    assert "pca16: recall@10" in out
    assert "hybrid top-5 (rrf):" in out


def test_trades_example(spark, capsys):
    import trades_example
    trades_example.main()
    out = capsys.readouterr().out
    assert "VOD" in out or "vwap" in out.lower()


def test_live_pipeline_example(spark, tmp_path, capsys):
    import live_pipeline
    # run_capstone=False: the capstone runs once, in its own test below
    n_batch, n_live = live_pipeline.main(SF, out_dir=str(tmp_path / "lp"),
                                         run_capstone=False)
    assert n_batch == n_live > 0
    assert "exactly-once: True" in capsys.readouterr().out


def test_crawl_capstone_example(spark, tmp_path):
    """The continuous-crawl capstone (r10 form): url_dedup -> substring
    snapshot probe -> WIDE content gate -> language gate -> quality
    gate -> split_assign -> checkpointed shard sink, with a snapshot
    AND model refresh between drops.  The refresh is now a GENERATION
    APPEND (write_snapshot mode="append"): drop-1 survivors' digests
    land in snap0's standing bucketed tables (cost ∝ the drop, no
    snapshot rewrite) and the engineered drop-2 duplicate of a drop-1
    survivor must die through that APPENDED artifact while its source
    survives; drop-2 serving must pick up the refreshed classifier
    weights; and the snapshot sides of the gate joins must scan
    BUCKETED with zero snapshot-side Exchange — appended files
    included."""
    import live_pipeline
    from pyspark.sql import functions as F
    work = str(tmp_path / "capstone")
    res = live_pipeline.crawl_capstone(spark, SF, work)
    assert res["drop1_kept"] > 0
    assert res["total_kept"] > res["drop1_kept"]
    assert res["dup_suppressed"] and res["dup_source_present"]
    assert res["splits"] == ["test", "train", "val"]
    assert res["known_passage_hits"] > 0
    # model refresh: the crafted probe doc scores differently under
    # the re-fitted quality model
    assert res["model_refreshed"], res["probe_scores"]
    # r9 gates: the blocked-URL doc dies at the pre-fetch rule gate
    # (never reaches the election), the repetition-spam doc clears the
    # URL gates and dies at the Gopher repetition gate
    assert res["url_blocked_suppressed"]
    assert res["repetition_suppressed"]
    # late-r9 domain cap: every whale page clears the URL election
    # (unique URLs), stage 1b admits exactly _CAP_HOST_K, and drop-2
    # whale pages are suppressed by the cap's cross-drop counter state
    assert res["whale_elected"] == (live_pipeline._CAP_WHALE_N + 3)
    assert res["whale_capped"] == live_pipeline._CAP_HOST_K
    assert res["whale_drop2_suppressed"]
    # r11 takedown epilogue: retracting the dup source re-admits a
    # re-crawl of ITS content while other kept content stays
    # suppressed, stable across the tombstone-folding compaction
    assert res["takedown_readmitted"]
    assert res["takedown_retained_suppressed"]
    assert res["takedown_stable_after_compaction"]
    # bucketed snapshot probes: the refreshed snapshot's digest/gram
    # tables join the gate's OWN key sets with zero snapshot-side
    # Exchange (the per-micro-batch stage-2 plan, read batch-side)
    from scespet_spark.operators.dedup import digest_cols
    from scespet_spark.operators.snapshot import read_snapshot
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # snap0's lineage: drop-1 generation APPEND, then the takedown
        # RETRACTION, then the tombstone-folding COMPACTION (r11
        # epilogue) — with no tombstones left standing afterwards
        import json
        manifest = json.loads(
            open(f"{work}/snap0/manifest.json").read())
        gens = manifest["generations"]
        assert [g["gen"] for g in gens] == [1, 2, 3]
        assert "digests" in gens[0]["appended"]
        assert "digests" in gens[1]["retracted"]
        assert "digests" in gens[2]["compacted"]
        assert not manifest.get("tombstones")
        snap = read_snapshot(spark, f"{work}/snap0")
        batch = spark.read.parquet(f"{work}/stage1")
        d1, d2 = digest_cols(F.col("text"), wide=True)
        content = (batch
                   .withColumn("content_hash", d1)
                   .withColumn("content_hash2", d2)
                   .join(snap["digests"].select("content_hash",
                                                "content_hash2"),
                         ["content_hash", "content_hash2"],
                         "left_anti"))
        plan = content._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1      # the crawl side only
        gprobe = (batch.select((F.col("doc_id") * 7).alias("__g"),
                               (F.col("doc_id") * 11).alias("__g2"))
                  .join(snap["grams"], ["__g", "__g2"], "left_semi"))
        gplan = gprobe._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in gplan
        assert gplan.count("Exchange") == 1
        # and the full gate chain runs on the bucketed scans
        qc2, lang2, thr2 = live_pipeline._cap_models(
            spark, batch.select("doc_id", "text", "lang"))
        sig, sharded = live_pipeline._cap_gate_chain(
            batch, snap, qc2, lang2, thr2)
        for df in (sig, sharded):
            p = df._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in p
            assert "BatchEvalPython" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
