"""The examples are operator compositions users copy — keep them
running against the real testdata."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

SF = "/root/testdata/sf0.001"


def test_corpus_pipeline_example(spark, tmp_path, capsys):
    import corpus_pipeline
    n_in, n_out = corpus_pipeline.main(SF, out_dir=str(tmp_path / "out"))
    assert n_in > 0 and 0 < n_out <= n_in
    # cache-release discipline: every explicitly persisted snapshot
    # table AND every operator-family cache must be released at the
    # phase boundaries (localCheckpoint lineage-truncation tables are
    # source data, not cache, and are exempt)
    assert "cache: 0 persisted tables left" in capsys.readouterr().out
    from scespet_spark.operators._cache import _REGISTRY
    assert not _REGISTRY, f"unreleased cache families: {list(_REGISTRY)}"


def test_ann_search_example(spark, capsys):
    import ann_search
    ann_search.main(SF)
    out = capsys.readouterr().out
    assert "recall@10" in out


def test_trades_example(spark, capsys):
    import trades_example
    trades_example.main()
    out = capsys.readouterr().out
    assert "VOD" in out or "vwap" in out.lower()


def test_live_pipeline_example(spark, tmp_path, capsys):
    import live_pipeline
    n_batch, n_live = live_pipeline.main(SF, out_dir=str(tmp_path / "lp"))
    assert n_batch == n_live > 0
    assert "exactly-once: True" in capsys.readouterr().out


def test_crawl_capstone_example(spark, tmp_path):
    """The r8 continuous-crawl capstone: url_dedup -> substring
    snapshot probe -> content gate -> classifier gate -> split_assign
    -> checkpointed shard sink, with a snapshot refresh between drops.
    The engineered drop-2 duplicate of a drop-1 survivor must die at
    the refreshed snapshot's content gate while its source survives."""
    import live_pipeline
    res = live_pipeline.crawl_capstone(spark, SF,
                                       str(tmp_path / "capstone"))
    assert res["drop1_kept"] > 0
    assert res["total_kept"] > res["drop1_kept"]
    assert res["dup_suppressed"] and res["dup_source_present"]
    assert res["splits"] == ["test", "train", "val"]
    assert res["known_passage_hits"] > 0
