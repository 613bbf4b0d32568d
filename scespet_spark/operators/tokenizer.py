"""Distributed BPE tokenizer training and application.

The classic byte-pair-encoding trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") has a
shape that distributes cleanly:

* the ONLY corpus-sized pass is the word-frequency count — one
  map-side-combinable ``groupBy`` whose output is VOCABULARY-sized
  (Zipf-bounded: ~millions of rows for 100 TB of text, not corpus-
  sized), further cut by ``min_count``;
* the merge loop itself runs driver-side over that word-frequency
  table — exactly how sentencepiece/HF trainers work — because pair
  counts between merges are a function of the (tiny) vocab, not the
  corpus.  No per-merge corpus pass ever happens.

Application is per-word and order-dependent (each word replays the
merge ranking), so it runs as an Arrow-batched ``mapInPandas`` with a
per-batch WORD MEMO — Zipf again: a batch of documents contains few
distinct words relative to tokens, so the Python cost is per distinct
word, not per token.

Reference parity note: the reference engine has no tokenizer; this is
part of the training-data-pipeline extension surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens

#: end-of-word sentinel (the Sennrich convention): merges never cross
#: word boundaries and a subword knows whether it ends a word
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(word, freq)`` — the one
    corpus-sized pass of BPE training; map-side combinable, output
    vocabulary-sized."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_fit(df: DataFrame, n_merges: int, text_col: str = "text",
            min_count: int = 1, max_vocab: int | None = None) -> DataFrame:
    """Train a BPE merge table: ``n_merges`` rows of ``(rank, left,
    right)`` — the tokenizer model artifact.  Deterministic: pair ties
    break on (left, right) lexicographically, so the same corpus always
    yields the same merges regardless of partitioning or engine.

    Scale shape: ONE distributed word-count pass (vocabulary-sized
    output, ``min_count`` prunes the long tail); the merge loop is
    driver-side over the collected vocab — per merge it touches only
    the words CONTAINING the merged pair (an inverted pair->words
    index), the standard trainer optimization.

    DRIVER-MEMORY BOUND (SCALE.md): the vocabulary collect is the one
    driver-sized structure of the trainer — standard (sentencepiece/HF
    fit the same way) but unbounded at crawl scale, where the distinct-
    word table of 100 TB of web text reaches 10^8+ rows (tens of GB of
    Python dict).  Bound it EITHER by sizing ``min_count`` to the
    corpus (Zipf: min_count ~ corpus_tokens / 10^7 keeps ~millions of
    rows) OR with ``max_vocab=N`` — keep only the top-``N`` words by
    (freq desc, word asc), ONE distributed TakeOrdered before the
    collect.  Truncation drops tail words whose total frequency mass
    is Zipf-negligible at real corpus sizes, so the learned merges are
    driven by the head as intended (pinned by
    ``test_bpe_max_vocab_caps_driver_collect``; a cap covering the
    whole vocabulary is a no-op)."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    wf = word_frequencies(df, text_col).filter(F.col("freq") >= min_count)
    if max_vocab is not None:
        if max_vocab <= 0:
            raise ValueError(f"max_vocab must be positive, got {max_vocab}")
        # distributed TakeOrdered (sort+limit -> no global sort barrier)
        wf = wf.orderBy(F.col("freq").desc(), F.col("word")) \
               .limit(max_vocab)
    wf = wf.collect()
    # driver-side state: word -> (symbol tuple, freq)
    words = {r["word"]: [tuple(r["word"]) + (EOW,), int(r["freq"])]
             for r in wf}
    from collections import defaultdict
    pair_freq: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for w, (sym, freq) in words.items():
        for a, b in zip(sym, sym[1:]):
            pair_freq[(a, b)] += freq
            pair_words[(a, b)].add(w)
    merges = []
    for rank in range(n_merges):
        if not pair_freq:
            break
        best = max(pair_freq, key=lambda p: (pair_freq[p], p[0], p[1]))
        # tie-break NOTE: max freq first, then lexicographically LARGEST
        # pair — any total order works for determinism; this one avoids
        # a second sort pass
        if pair_freq[best] <= 0:
            break
        merges.append((rank, best[0], best[1]))
        for w in list(pair_words[best]):
            sym, freq = words[w]
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] -= freq
                pair_words[(a, b)].discard(w)
            sym = _merge_word(sym, best)
            words[w][0] = sym
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] += freq
                pair_words[(a, b)].add(w)
        pair_freq = defaultdict(int, {p: f for p, f in pair_freq.items()
                                      if f > 0})
    return df.sparkSession.createDataFrame(
        merges, "rank long, left string, right string")


def bpe_apply(df: DataFrame, merges: DataFrame, text_col: str = "text",
              out: str = "bpe_tokens") -> DataFrame:
    """Tokenize documents under a FITTED merge table: each word splits
    to characters + ``</w>`` and replays the merges in rank order
    (lowest-rank applicable merge first — the standard BPE encoder).
    Returns the input plus ``out`` (the subword array) and
    ``n_bpe_tokens``.

    Runs as ONE Arrow-batched ``mapInPandas`` with a per-batch word
    memo (Zipf: cost is per distinct word, not per token) and the
    merge RANKING broadcast as a plain dict (model-sized).  Lossless by
    construction: concatenating a word's subwords and stripping the
    end marker reproduces the word (property-tested)."""
    clash = {out, "n_bpe_tokens"} & set(df.columns)
    if clash:
        raise ValueError(
            f"output column(s) {sorted(clash)} already exist on the "
            f"input — rename them or pass a different out=")
    ranking = {(r["left"], r["right"]): int(r["rank"])
               for r in merges.collect()}
    # the output schema is built programmatically AND the Arrow stage
    # runs under positional safe names (mapInPandas resolves output
    # schema field names as column references, so a name needing
    # quoting — dots, spaces — would fail analysis); toDF restores the
    # caller's names afterwards without any resolution step
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)
    safe = [f"__c{i}" for i in range(len(df.columns))]
    text_safe = safe[df.columns.index(text_col)]
    out_schema = StructType(
        [StructField(s, f.dataType, f.nullable)
         for s, f in zip(safe, df.schema.fields)]
        + [StructField("__bpe", ArrayType(StringType())),
           StructField("__nbpe", LongType())])

    def encode_batches(batches):
        memo: dict = {}

        def encode(word: str) -> list:
            got = memo.get(word)
            if got is not None:
                return got
            sym = tuple(word) + (EOW,)
            while len(sym) > 1:
                pairs = {(a, b) for a, b in zip(sym, sym[1:])}
                ranked = [(ranking[p], p) for p in pairs if p in ranking]
                if not ranked:
                    break
                _, best = min(ranked)
                sym = _merge_word(sym, best)
            memo[word] = list(sym)
            return memo[word]

        for pdf in batches:
            toks = pdf[text_safe].map(
                lambda t: [s for w in (t or "").split(" ") if w
                           for s in encode(w)])
            pdf = pdf.assign(__bpe=toks, __nbpe=toks.str.len())
            yield pdf

    return (df.toDF(*safe).mapInPandas(encode_batches, out_schema)
            .toDF(*df.columns, out, "n_bpe_tokens"))
