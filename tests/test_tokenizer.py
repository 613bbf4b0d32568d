"""BPE trainer/encoder: pinned classic behavior, losslessness,
determinism, and the distributed shapes."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from scespet_spark.operators.tokenizer import EOW, bpe_apply, bpe_fit

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[
                        HealthCheck.function_scoped_fixture])

_CORPUS = ("low low low low low lower lower newest newest newest "
           "newest newest newest widest widest widest")


def test_bpe_fit_pins_classic_merges(spark):
    """The Sennrich corpus: high-frequency pairs merge first and words
    coalesce into the classic subwords (est</w>, newest</w>, low)."""
    docs = spark.createDataFrame([(0, _CORPUS)], "doc_id long, text string")
    merges = bpe_fit(docs, n_merges=10)
    got = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    # ('t','</w>') and ('e','s') tie at freq 9 (newest x6 + widest x3);
    # the documented tie-break (lexicographically largest pair) picks
    # ('t','</w>') — pin the deterministic order
    assert got[:3] == [("t", "</w>"), ("s", "t</w>"), ("e", "st</w>")]
    enc = {r.doc_id: r for r in bpe_apply(docs, merges).collect()}
    assert enc[0].bpe_tokens[:5] == ["low</w>"] * 5
    assert "newest</w>" in enc[0].bpe_tokens


def test_bpe_fit_deterministic_under_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, _CORPUS) for i in range(6)], "doc_id long, text string")
    m1 = [(r.rank, r.left, r.right)
          for r in bpe_fit(docs, 8).orderBy("rank").collect()]
    m2 = [(r.rank, r.left, r.right)
          for r in bpe_fit(docs.repartition(5), 8).orderBy("rank").collect()]
    assert m1 == m2


def test_bpe_min_count_prunes_tail(spark):
    docs = spark.createDataFrame(
        [(0, "aaa aaa aaa zq")], "doc_id long, text string")
    merges = bpe_fit(docs, 5, min_count=2)
    syms = {r.left for r in merges.collect()} | \
        {r.right for r in merges.collect()}
    assert "z" not in syms and "q" not in syms  # tail word pruned


@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=10))
@SETTINGS
def test_bpe_roundtrip_lossless(spark, words):
    """Encoding is lossless for any corpus: concatenating a doc's
    subwords and splitting on the end marker reproduces the words."""
    text = " ".join(words)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = bpe_fit(docs, n_merges=6)
    r = bpe_apply(docs, merges).collect()[0]
    rebuilt = "".join(r.bpe_tokens).replace(EOW, " ").strip()
    assert rebuilt == text
    # every word ends at an EOW boundary: token count >= word count
    assert r.n_bpe_tokens >= len(words)


def test_bpe_apply_plan_is_one_arrow_stage(spark):
    docs = spark.createDataFrame([(0, _CORPUS)], "doc_id long, text string")
    merges = bpe_fit(docs, 4)
    plan = (bpe_apply(docs, merges)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # map-only: no shuffle


def test_bpe_apply_guards_output_schema(spark):
    """r9 fix: the mapInPandas schema is built programmatically — odd
    input column names survive, and a pre-existing output column is a
    loud error instead of a broken duplicate-field schema."""
    import pytest
    docs = spark.createDataFrame(
        [(0, "aa aa bb", "x")],
        "doc_id long, text string, `odd.name` string")
    merges = bpe_fit(docs.select("doc_id", "text"), 2)
    got = bpe_apply(docs, merges).collect()[0]
    assert got["odd.name"] == "x" and got.n_bpe_tokens > 0
    with pytest.raises(ValueError, match="already exist"):
        bpe_apply(docs.withColumn("bpe_tokens", F.lit(1)), merges)


def test_bpe_max_vocab_caps_driver_collect(spark):
    """max_vocab bounds the trainer's one driver-sized structure (r9):
    a cap covering the whole vocabulary changes nothing; a tail-
    truncating cap still pins the classic head merges (Zipf: the head
    carries the pair mass); the plan is a TakeOrdered, not a global
    sort; and a non-positive cap is a loud error."""
    import pytest
    docs = spark.createDataFrame([(0, _CORPUS)], "doc_id long, text string")
    full = [(r.rank, r.left, r.right)
            for r in bpe_fit(docs, 6).orderBy("rank").collect()]
    capped_all = [(r.rank, r.left, r.right)
                  for r in bpe_fit(docs, 6, max_vocab=4)
                  .orderBy("rank").collect()]
    assert capped_all == full            # corpus has 4 distinct words
    # drop the tail (widest x3, lower x2): newest(6) + low(5) remain —
    # merges draw only on kept words (no 'i'/'d'/'r' from the tail)
    capped = bpe_fit(docs, 6, max_vocab=2).collect()
    syms = "".join(r.left + r.right for r in capped).replace(EOW, "")
    assert set(syms) <= set("newstlo")
    # deterministic under partitioning with the cap in play
    again = bpe_fit(docs.repartition(5), 6, max_vocab=2).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, again))
    with pytest.raises(ValueError, match="max_vocab"):
        bpe_fit(docs, 2, max_vocab=0)


def test_bpe_merges_snapshot_artifact(spark, tmp_path):
    """The tokenizer model persists as a snapshot artifact (r9):
    encoding under the LOADED merge table is row-identical to encoding
    under a fresh fit, the manifest records the trainer params
    (check_compat catches a drifted re-fit), and the artifact
    round-trips through read_snapshot."""
    import pytest
    from pyspark.sql import functions as F
    from scespet_spark.operators.snapshot import (check_compat,
                                                  read_snapshot,
                                                  write_snapshot)
    from scespet_spark.sources.batch import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "snap")
    write_snapshot(out, docs=docs, sub_min_len=5, bpe_merges=32)
    check_compat(out, bpe_merges=32, bpe_max_vocab=None)
    with pytest.raises(ValueError, match="bpe_merges"):
        check_compat(out, bpe_merges=64)
    merges = read_snapshot(spark, out)["bpe_merges"]
    fresh = bpe_fit(docs, 32)
    assert sorted(map(tuple, merges.collect())) == \
        sorted(map(tuple, fresh.collect()))
    got = bpe_apply(docs, merges).select("doc_id", "n_bpe_tokens")
    want = bpe_apply(docs, fresh).select("doc_id", "n_bpe_tokens")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError, match="needs docs"):
        write_snapshot(str(tmp_path / "s2"), bpe_merges=8)


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (Kudo 2018 Viterbi-EM variant)
# ---------------------------------------------------------------------------

from scespet_spark.operators.tokenizer import (_em_counts, _unk_logp,
                                               _viterbi, unigram_apply,
                                               unigram_fit, unigram_seed)


def test_unigram_learns_whole_word_piece(spark):
    """A word dominating the corpus becomes a single piece and the
    encoder emits it as ONE token."""
    docs = spark.createDataFrame(
        [(0, "hello hello hello hello hello hello world")],
        "doc_id long, text string")
    m = unigram_fit(docs, vocab_size=24, em_iters=3)
    pieces = {r.piece for r in m.collect()}
    assert "hello" in pieces
    enc = unigram_apply(docs, m).head()
    assert enc.unigram_tokens.count("hello") == 6


def test_unigram_viterbi_prefers_probable_segmentation():
    import math
    # 'ab' as one piece beats a+b when its prob dominates
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.5)}
    assert _viterbi("ab", logp, _unk_logp(logp), 8) == ["ab"]
    # ...and loses when the single chars dominate
    logp = {"a": math.log(0.45), "b": math.log(0.45), "ab": math.log(0.01)}
    assert _viterbi("ab", logp, _unk_logp(logp), 8) == ["a", "b"]


def test_unigram_oov_chars_pass_through():
    import math
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    assert _viterbi("axb", logp, _unk_logp(logp), 8) == ["a", "x", "b"]


def test_unigram_deterministic_under_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, "spark stream table spark stream spark") for i in range(8)],
        "doc_id long, text string")
    a = sorted((r.piece, r.logprob)
               for r in unigram_fit(docs, 32, em_iters=2).collect())
    b = sorted((r.piece, r.logprob)
               for r in unigram_fit(docs.repartition(7), 32,
                                    em_iters=2).collect())
    assert a == b


@SETTINGS
@given(st.lists(st.text(alphabet="abcxyz é", min_size=0, max_size=12),
                min_size=1, max_size=6))
def test_unigram_roundtrip_lossless(spark, texts):
    """Concatenating each word's pieces reproduces the word — for ANY
    input, including characters the model never saw (OOV fallback)."""
    train = spark.createDataFrame(
        [(0, "abc abc xyz xyz abc")], "doc_id long, text string")
    m = unigram_fit(train, vocab_size=16, em_iters=2)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for row in unigram_apply(df, m).collect():
        words = [w for w in (row.text or "").split(" ") if w]
        toks = list(row.unigram_tokens)
        i = 0
        for w in words:
            acc = ""
            while acc != w:
                assert i < len(toks) and len(acc) < len(w)
                acc += toks[i]
                i += 1
        assert i == len(toks)


def test_unigram_em_step_non_decreasing_likelihood(spark):
    """Hard-EM invariant: re-estimating probabilities from the Viterbi
    segmentation never lowers the total Viterbi log-likelihood (before
    any pruning)."""
    import math
    docs = spark.createDataFrame(
        [(0, "abab abab ab cd cdcd abcd abcd abab")],
        "doc_id long, text string")
    wf, logp = unigram_seed(docs, seed_size=64, text_col="text",
                            max_piece_len=4, min_count=1)
    wf_rows = [(r.word, int(r.freq)) for r in wf.collect()]

    def total_ll(model):
        unk = _unk_logp(model)
        return sum(freq * sum(model.get(p, unk)
                              for p in _viterbi(w, model, unk, 4))
                   for w, freq in wf_rows)

    before = total_ll(logp)
    counts = _em_counts(wf, logp, 4)
    total = sum(counts.values())
    new_logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    for p in {q for q in logp if len(q) == 1}:
        new_logp.setdefault(p, math.log(0.5 / total))
    assert total_ll(new_logp) >= before - 1e-9


def test_unigram_prunes_to_vocab_and_keeps_chars(spark):
    docs = spark.createDataFrame(
        [(0, "stream stream stream table table spark")],
        "doc_id long, text string")
    chars = {c for c in "streamblpk" if c != " "}
    m = unigram_fit(docs, vocab_size=len(chars) + 2, em_iters=4)
    pieces = {r.piece for r in m.collect()}
    assert len(pieces) <= len(chars) + 2
    # every corpus character survives pruning (losslessness anchor)
    assert chars <= pieces


def test_unigram_apply_rejects_column_clash(spark):
    docs = spark.createDataFrame(
        [(0, "a", ["x"])],
        "doc_id long, text string, unigram_tokens array<string>")
    m = unigram_fit(docs.select("doc_id", "text"), 8, em_iters=1)
    import pytest
    with pytest.raises(ValueError, match="already exist"):
        unigram_apply(docs, m)


def test_unigram_pieces_snapshot_artifact(spark, tmp_path):
    """The unigram model persists as a snapshot artifact under the same
    train-once-per-snapshot contract as bpe_merges: encoding under the
    LOADED piece table is row-identical to a fresh fit, and the
    manifest records the trainer params."""
    import pytest
    from scespet_spark.operators.snapshot import (check_compat,
                                                  read_snapshot,
                                                  write_snapshot)
    from scespet_spark.sources.batch import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "snap")
    write_snapshot(out, docs=docs, sub_min_len=5, unigram_vocab=44,
                   unigram_em_iters=2)
    check_compat(out, unigram_vocab=44, unigram_em_iters=2)
    with pytest.raises(ValueError, match="unigram_vocab"):
        check_compat(out, unigram_vocab=64)
    pieces = read_snapshot(spark, out)["unigram_pieces"]
    fresh = unigram_fit(docs, vocab_size=44, em_iters=2)
    assert sorted(map(tuple, pieces.collect())) == \
        sorted(map(tuple, fresh.collect()))
    got = unigram_apply(docs, pieces).select("doc_id", "n_unigram_tokens")
    want = unigram_apply(docs, fresh).select("doc_id", "n_unigram_tokens")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    with pytest.raises(ValueError, match="needs docs"):
        write_snapshot(str(tmp_path / "s2"), unigram_vocab=8)
