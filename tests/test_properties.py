"""Property-based semantics checks (hypothesis): the engine's DataFrame
translation must equal a direct Python model of the reference's
push-graph semantics (one event at a time, (t, seq) replay order) on
randomized inputs — including duplicate timestamps, empty streams, and
one-sided streams, the edge cases golden tests under-sample.

Spark jobs per example are ~0.5s, so example counts are kept small;
the point is shrunk counterexamples, not volume.
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from scespet_spark import AFTER, BEFORE, Count, Stream, Trigger

# events: non-decreasing ts with ties, global seq = draw order
_values = st.lists(st.integers(-5, 5), min_size=0, max_size=10)


def _mk_stream(spark, pairs, col="v"):
    # pairs: list of (ts, seq, value)
    if not pairs:
        df = spark.createDataFrame([], f"ts long, seq long, {col} long")
    else:
        df = spark.createDataFrame(pairs, f"ts long, seq long, {col} long")
    return Stream(df, t="ts", seq="seq")


#: examples per property — default sized so the 20 property tests fit
#: the driver's serial verify window (each example is several Spark
#: jobs); deeper local sweeps: SPARK_GRAFT_HYPOTHESIS_EXAMPLES=50
import os as _os

_N_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "6"))
SETTINGS = settings(max_examples=_N_EXAMPLES, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(lv=_values, rv=_values, lts=st.lists(st.integers(0, 4), min_size=10,
                                            max_size=10),
       rts=st.lists(st.integers(0, 4), min_size=10, max_size=10))
@SETTINGS
def test_zip_and_take_match_model(spark, lv, rv, lts, rts):
    left = [(t, 2 * i, v) for i, (t, v) in enumerate(zip(sorted(lts[:len(lv)]), lv))]
    right = [(t, 2 * i + 1, v) for i, (t, v) in enumerate(zip(sorted(rts[:len(rv)]), rv))]

    # model: replay merged events in (ts, seq) order, keep latest per side
    merged = sorted([(t, s, "L", v) for t, s, v in left]
                    + [(t, s, "R", v) for t, s, v in right])
    last = {"L": None, "R": None}
    zip_expect, take_expect = [], []
    for t, s, side, v in merged:
        last[side] = v
        zip_expect.append((t, s, last["L"], last["R"]))
        if side == "R":
            take_expect.append((t, s, last["L"], last["R"]))

    ls = _mk_stream(spark, left, "lx")
    rs = _mk_stream(spark, right, "rx")
    got_zip = sorted((r.ts, r.seq, r.lx, r.rx) for r in
                     ls.zip_join(rs, ["lx"], ["rx"]).df.collect())
    assert got_zip == zip_expect
    got_take = sorted((r.ts, r.seq, r.lx, r.rx) for r in
                      ls.take(rs, ["lx"], ["rx"]).df.collect())
    assert got_take == take_expect


@given(vals=_values, n=st.integers(1, 4))
@SETTINGS
def test_count_slice_matches_model(spark, vals, n):
    rows = [(i, i, v) for i, v in enumerate(vals)]
    s = _mk_stream(spark, rows)
    got = sorted((r.ts, r.s) for r in
                 s.group(Count(n)).reduce(s=F.sum("v")).df.collect())
    expect = []
    for b in range(0, len(vals), n):
        chunk = vals[b:b + n]
        close_ts = b + len(chunk) - 1  # bucket emits at its last event
        expect.append((close_ts, sum(chunk)))
    assert got == sorted(expect)


@given(vals=_values, boundary=st.integers(-5, 5))
@SETTINGS
def test_trigger_slice_alignment_matches_model(spark, vals, boundary):
    rows = [(i, i, v) for i, v in enumerate(vals)]
    s = _mk_stream(spark, rows)
    for align in (BEFORE, AFTER):
        got = sorted((r.ts, r.s) for r in
                     s.group(Trigger(F.col("v") == boundary, align))
                     .reduce(s=F.sum("v")).df.collect())
        # model: walk events, bucket id advances on boundary events —
        # BEFORE: the boundary event starts the new bucket; AFTER: it
        # closes the old one (TestSingleTerms.scala:157-181)
        buckets = {}
        b = 0
        for i, v in enumerate(vals):
            hit = v == boundary
            if hit and align == BEFORE:
                b += 1
            buckets.setdefault(b, []).append((i, v))
            if hit and align == AFTER:
                b += 1
        expect = sorted(
            (max(i for i, _ in rs), sum(v for _, v in rs))
            for rs in buckets.values())
        assert got == expect


@given(vals=_values)
@SETTINGS
def test_scan_is_prefix_sums(spark, vals):
    rows = [(i, i, v) for i, v in enumerate(vals)]
    s = _mk_stream(spark, rows)
    got = [r.c for r in s.scan(c=F.sum("v")).df.orderBy("seq").collect()]
    expect, acc = [], 0
    for v in vals:
        acc += v
        expect.append(acc)
    assert got == expect


@given(gaps=st.lists(st.integers(1, 30), min_size=1, max_size=10))
@SETTINGS
def test_session_windows_match_gap_model(spark, gaps):
    # cumulative gap walk: new session whenever inter-arrival > 10
    from scespet_spark import Session
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    rows = [(t * 1_000_000, i, 1) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "us long, seq long, v long").select(
        F.timestamp_micros("us").alias("ts"), "seq", "v")
    s = Stream(df, t="ts", seq="seq")
    got = sorted(r.n for r in
                 s.group(Session("10 seconds")).reduce(n=F.count("*")).df.collect())
    sizes, cur = [], 1
    for g in gaps[1:]:
        if g > 10:
            sizes.append(cur)
            cur = 1
        else:
            cur += 1
    sizes.append(cur)
    assert got == sorted(sizes)


@given(ntoks=st.lists(st.integers(0, 40), min_size=1, max_size=12),
       budget=st.integers(1, 30))
@SETTINGS
def test_pack_sequences_tape_invariants(spark, ntoks, budget):
    # concat-and-chunk model: starts are the exclusive prefix sum; the
    # sequence span covers exactly [start, start+n) on the token tape
    from scespet_spark.operators.pipeline import pack_sequences
    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(ntoks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pack_sequences(df, budget=budget,
                                               bucket_size=3).collect()}
    cum = 0
    for i, n in enumerate(ntoks):
        r = got[i]
        assert r.n_tokens == n
        assert r.start_tok == cum
        assert r.seq_first == cum // budget
        last = (cum + n - 1) // budget if n else cum // budget
        assert r.seq_last == last
        assert r.off_in_seq == cum % budget
        cum += n


_C4_LINE = st.sampled_from([
    "A good enough sentence here.", "short.", "no terminal punct",
    "- bullet item stays here.", "please accept our cookie policy.",
    "thought trails away and away...", "Sentence with JavaScript inside.",
])


@given(lines=st.lists(_C4_LINE, min_size=1, max_size=8))
@SETTINGS
def test_c4_rule_filter_matches_line_model(spark, lines):
    """c4_rule_filter == a pure-Python model of the line rules and doc
    gates on randomized line mixes; clean_text is always a subsequence
    of the input lines."""
    from scespet_spark.operators.text import C4_MARKERS, c4_rule_filter
    text = "\n".join(lines)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_rule_filter(df).collect()[0]

    def ok(x):
        words = [w for w in x.split(" ") if w]
        return (x[-1:] in '.!?"\'' and len(words) >= 3
                and not any(m in x.lower() for m in C4_MARKERS))
    kept = [x for x in lines if ok(x)]
    nb = sum(1 for x in lines if x.lstrip().startswith(("-", "*", "•")))
    ne = sum(1 for x in lines if x.endswith("..."))
    assert r.clean_text == "\n".join(kept)
    assert (r.n_lines, r.n_kept_lines) == (len(lines), len(kept))
    want_keep = int(len(kept) >= 1 and nb <= 0.9 * len(lines)
                    and ne <= 0.3 * len(lines))
    assert r.keep == want_keep


@given(tf_a=st.integers(0, 6), tf_b=st.integers(0, 6),
       filler=st.integers(0, 10))
@SETTINGS
def test_bm25_matches_closed_form(spark, tf_a, tf_b, filler):
    """bm25_score == the closed-form BM25 formula computed in Python
    for arbitrary term frequencies and doc lengths (one scored doc, one
    background doc fixing N/avgdl/df)."""
    import math
    from scespet_spark.operators.text import bm25_score, bm25_stats
    text = " ".join(["qa"] * tf_a + ["qb"] * tf_b + ["x"] * filler)
    docs = spark.createDataFrame(
        [(1, text), (2, "qa background doc text")],
        "doc_id long, text string")
    stats = bm25_stats(docs, ["qa", "qb"])
    got = {r.doc_id: r for r in bm25_score(docs, ["qa", "qb"],
                                           stats).collect()}
    dl = tf_a + tf_b + filler
    want = 0.0
    for t, tf in (("qa", tf_a), ("qb", tf_b)):
        if tf:
            idf = math.log((stats["n"] - stats["df"][t] + 0.5)
                           / (stats["df"][t] + 0.5) + 1)
            want += idf * tf / (tf + 1.2 * (1 - 0.75
                                            + 0.75 * dl / stats["avgdl"]))
    if tf_a or tf_b:
        assert abs(got[1].score - round(want, 6)) <= 1e-6
        assert got[1].n_terms_hit == int(tf_a > 0) + int(tf_b > 0)
    else:
        assert 1 not in got


@given(ntoks=st.lists(st.integers(0, 40), min_size=1, max_size=14),
       budget=st.integers(1, 30))
@SETTINGS
def test_pack_bestfit_matches_ffd_model(spark, ntoks, budget):
    """pack_sequences_bestfit == a pure-Python per-group FFD model
    (descending size, id tie-break, first open bin with room), plus
    the FFD waste invariants: no sequence overfills and at most one
    non-oversized sequence per group is under half full."""
    from collections import Counter, defaultdict
    from scespet_spark.operators.pipeline import pack_sequences_bestfit
    G = 5
    rows = [(i, " ".join(["w"] * n) if n else "")
            for i, n in enumerate(ntoks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           pack_sequences_bestfit(df, budget=budget,
                                  group_size=G).collect()}
    model = {}
    for grp in sorted({i // G for i in range(len(ntoks))}):
        items = sorted(((n, i) for i, n in enumerate(ntoks)
                        if i // G == grp), key=lambda t: (-t[0], t[1]))
        rem = []
        for n, i in items:
            if n > budget:
                rem.append(-1)   # oversized: refuses every later doc
                model[i] = (len(rem) - 1 + grp * G, 1)
                continue
            for b, r in enumerate(rem):
                if r >= n:
                    rem[b] = r - n
                    model[i] = (b + grp * G, 0)
                    break
            else:
                rem.append(budget - n)
                model[i] = (len(rem) - 1 + grp * G, 0)
    assert {i: (r.seq_id, r.oversize) for i, r in got.items()} == model
    fills = Counter()
    for i, n in enumerate(ntoks):
        if not got[i].oversize:
            fills[got[i].seq_id] += n
    assert all(v <= budget for v in fills.values())
    per_grp = defaultdict(list)
    for s, v in fills.items():
        per_grp[s // G].append(v)
    for vals in per_grp.values():
        # first-fit invariant: two sequences under half full would mean
        # the later one's first doc fit in the earlier one
        assert sum(1 for v in vals if v < budget / 2) <= 1


@given(vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=2,
                     max_size=8))
@SETTINGS
def test_quantize_codes_within_range_and_monotone(spark, vals):
    from scespet_spark.operators.pipeline import quantize_embeddings
    df = spark.createDataFrame([(1, vals)], "vec_id long, embedding array<double>")
    r = quantize_embeddings(df).collect()[0]
    assert all(0 <= q <= 255 for q in r.q)
    # order-preserving: larger input never gets a smaller code
    pairs = sorted(zip(vals, r.q))
    assert all(q1 <= q2 for (_, q1), (_, q2) in zip(pairs, pairs[1:]))


@given(new_texts=st.lists(st.sampled_from("abcd"), min_size=0, max_size=8),
       prior_texts=st.lists(st.sampled_from("abcd"), min_size=0, max_size=4))
@SETTINGS
def test_incremental_keep_matches_set_model(spark, new_texts, prior_texts):
    """incremental_keep == {min-id of each digest in the new batch whose
    text is absent from the prior corpus} on randomized overlapping
    single-token corpora (duplicates within batch, across batches, and
    empty sides all covered)."""
    from scespet_spark.operators.dedup import incremental_keep
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_texts)] or [],
        "doc_id long, text string")
    prior = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(prior_texts)] or [],
        "doc_id long, text string")
    got = sorted(r.doc_id for r in incremental_keep(new, prior).collect())
    firsts = {}
    for i, t in enumerate(new_texts):
        if t not in prior_texts and t not in firsts:
            firsts[t] = i
    assert got == sorted(firsts.values())


@given(new_texts=st.lists(st.sampled_from("abcd"), min_size=1, max_size=8),
       prior_texts=st.lists(st.sampled_from("abcd"), min_size=1, max_size=4))
@SETTINGS
def test_incremental_keep_bloom_parity(spark, new_texts, prior_texts):
    """The prior_bloom= fast path is row-identical to the plain
    anti-join on randomized overlapping corpora — under a deliberately
    UNDERSIZED filter (m=64, fpp~0.5) so Bloom false positives are
    routine and must resolve through the exact join, never drop or
    keep a wrong doc."""
    from scespet_spark.operators.bloom import bloom_build, bloom_dense
    from scespet_spark.operators.dedup import exact_groups, incremental_keep
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_texts)],
        "doc_id long, text string")
    prior = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(prior_texts)],
        "doc_id long, text string")
    pri_dig = exact_groups(prior).select("content_hash")
    words, m, k = bloom_build(pri_dig, "content_hash", n_items=1, fpp=0.5)
    bloom = {"m": m, "k": k, "words": bloom_dense(words, m)}
    plain = sorted(map(tuple, incremental_keep(new, prior).collect()))
    fast = sorted(map(tuple, incremental_keep(
        new, pri_dig, prior_digest_col="content_hash",
        prior_bloom=bloom).collect()))
    assert plain == fast


@given(lev=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 3),
                              st.integers(-5, 5)), max_size=8),
       rev=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1),
                              st.integers(-5, 5)), max_size=8))
@SETTINGS
def test_keymap_zip_and_take_match_model(spark, lev, rev):
    """K->K2 vector join vs the reference push-model (VectorJoin.scala:
    16-133): left cells bind buckets via an explicit dict (key 3 left
    UNMAPPED), right events fire every live cell in their bucket, ties
    resolve left-first, pre-cell right values are visible at bind time,
    unmapped cells keep a forever-null right side (zip) / never fire
    (take)."""
    key_map = {0: 0, 1: 1, 2: 0}          # key 3 unmapped
    left = [(t, 2 * i, k, v) for i, (t, k, v)
            in enumerate(sorted(lev, key=lambda e: e[0]))]
    right = [(t, 2 * i + 1, b, v) for i, (t, b, v)
             in enumerate(sorted(rev, key=lambda e: e[0]))]

    merged = sorted([(t, s, 0, k, v) for t, s, k, v in left]
                    + [(t, s, 1, b, v) for t, s, b, v in right],
                    key=lambda e: (e[0], e[1], e[2]))
    cells, ybkt = {}, {}
    zip_expect, take_expect = [], []
    for t, s, side, kb, v in merged:
        if side == 0:
            cells[kb] = v
            zip_expect.append((kb, t, s, v, ybkt.get(key_map.get(kb))))
        else:
            for k in cells:
                if key_map.get(k) == kb:
                    row = (k, t, s, cells[k], v)
                    zip_expect.append(row)
                    take_expect.append(row)
            ybkt[kb] = v

    ldf = spark.createDataFrame(left or [], "ts long, seq long, k long, xv long")
    rdf = spark.createDataFrame(right or [], "ts long, seq long, b long, yv long")
    ls = Stream(ldf, t="ts", seq="seq", keys=("k",))
    rs = Stream(rdf, t="ts", seq="seq", keys=("b",))

    got_zip = sorted((r.k, r.ts, r.seq, r.xv, r.yv) for r in
                     ls.zip_join(rs, ["xv"], ["yv"], key_map=key_map)
                     .df.collect())
    assert got_zip == sorted(zip_expect)
    got_take = sorted((r.k, r.ts, r.seq, r.xv, r.yv) for r in
                      ls.take(rs, ["xv"], ["yv"], key_map=key_map)
                      .df.collect())
    assert got_take == sorted(take_expect)


@given(docs=st.lists(st.lists(st.sampled_from("abc"), min_size=0,
                              max_size=9),
                     min_size=1, max_size=8),
       size=st.integers(1, 4))
@SETTINGS
def test_segment_dedup_matches_first_occurrence_model(spark, docs, size):
    """segment_dedup == a direct Python model: segments in (doc_id,
    seg_idx) order, first occurrence of each segment text wins, docs
    reassemble from survivors, all-loser docs drop.  Random corpora
    with tiny alphabets maximize cross-doc segment collisions."""
    from scespet_spark.operators.dedup import segment_dedup
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    # python model
    seen, want = set(), {}
    for i, toks in enumerate(docs):
        if not toks:
            continue
        segs = [toks[j:j + size] for j in range(0, len(toks), size)]
        kept = []
        for sg in segs:
            key = " ".join(sg)
            if key not in seen:
                seen.add(key)
                kept.append(key)
        if kept:
            want[i] = (" ".join(kept), len(kept), len(segs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_kept, r.n_segments)
           for r in segment_dedup(df, size=size).collect()}
    assert got == want


@given(pre_a=st.lists(st.sampled_from("pqr"), min_size=0, max_size=6),
       post_a=st.lists(st.sampled_from("stu"), min_size=0, max_size=6),
       pre_b=st.lists(st.sampled_from("vwx"), min_size=0, max_size=6),
       shared=st.lists(st.sampled_from("abcdef"), min_size=6, max_size=10))
@SETTINGS
def test_winnowing_shared_run_guarantee(spark, pre_a, post_a, pre_b, shared):
    """Winnowing guarantee (Schleimer et al.): two docs sharing a token
    run of >= window + shingle_n - 1 = 6 tokens MUST share at least one
    selected fingerprint, wherever the run sits inside each doc."""
    from scespet_spark.operators.dedup import winnow_fingerprints
    rows = [(1, " ".join(pre_a + shared + post_a)),
            (2, " ".join(pre_b + shared))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, shingle_n=3, window=4).collect()
    a = {r.fingerprint for r in fp if r.doc_id == 1}
    b = {r.fingerprint for r in fp if r.doc_id == 2}
    assert a & b


# --- exact-substring dedup vs a direct Python model --------------------

def _substring_model(docs, L):
    """Reference model of suffix-array-family dedup: enumerate every
    L-gram occurrence in global (doc_id, pos) order, mark all but the
    first occurrence of each gram CONTENT as duplicates, remove tokens
    covered by any duplicate occurrence, reassemble."""
    toks = {i: t.split() for i, t in docs}
    first = {}
    cuts = {i: set() for i, _ in docs}
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - L + 1):
            g = tuple(t[p:p + L])
            if g in first:
                cuts[i].add(p)
            else:
                first[g] = (i, p)
    out = {}
    for i, t in toks.items():
        covered = set()
        for c in cuts[i]:
            covered.update(range(c, c + L))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        out[i] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


@given(docs=st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=12),
    min_size=1, max_size=6))
@SETTINGS
def test_substring_dedup_matches_bruteforce_model(spark, docs):
    """Tiny 3-token vocabulary forces dense arbitrary-offset overlap —
    within-doc repeats, cross-doc repeats, full-doc duplication, and
    docs shorter than L, all shrunk to minimal counterexamples."""
    from scespet_spark.operators.dedup import substring_dedup
    L = 3
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
           for r in substring_dedup(df, min_len=L).collect()}
    assert got == _substring_model(rows, L)


# --- live N-way bind vs the batch rendezvous model ---------------------

def _bind_model(rows, every_s, L_only_closed=True):
    """Model of live_bind emit='last': fold (key, cycle)-grouped rows
    in time order into per-slice XY buckets; only buckets closed by a
    later-cycle row emit.  rows: (ts_s, seq, key, side)."""
    from collections import defaultdict
    out = []
    per_key = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r[0], r[1])):
        per_key[r[2]].append(r)
    for k, ev in per_key.items():
        cycles = {}
        for ts, seq, _k, side in ev:
            cycles.setdefault(ts, []).append((ts, seq, side))
        ordered = sorted(cycles)
        open_b, last = None, None
        for ci, cyc in enumerate(ordered):
            bid = cyc // every_s
            is_final_cycle = ci == len(ordered) - 1
            if open_b is not None and bid > open_b["bid"]:
                out.append((k, last[0], last[1], open_b["c"], open_b["p"],
                            open_b["b"]))
                open_b = None
            if is_final_cycle:
                break  # the pending cycle never fires; its bucket never closes
            if open_b is None:
                open_b = {"bid": bid, "c": 0, "p": 0, "b": 0}
            sides = {s for _, _, s in cycles[cyc]}
            open_b["c"] += int("click" in sides)
            open_b["p"] += int("purchase" in sides)
            open_b["b"] += int({"click", "purchase"} <= sides)
            last = (cyc, max(s for _, s, _ in cycles[cyc]))
        # the final cycle, pending forever, still CLOSES the previous
        # bucket if it belongs to a later slice
        if open_b is not None and ordered:
            if ordered[-1] // every_s > open_b["bid"]:
                out.append((k, last[0], last[1], open_b["c"], open_b["p"],
                            open_b["b"]))
    return sorted(out)


@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_live_bind_matches_model_at_random_drop_boundaries(spark, tmp_path_factory, data):
    """live_bind emissions must be invariant to WHERE the micro-batch
    boundaries fall (the pending-cycle state machinery) and equal the
    rendezvous model: cycles fire once with all sides, only closed
    buckets emit."""
    import os
    import pandas as pd
    from scespet_spark.streaming.live import live_bind, run_available_now

    n = data.draw(st.integers(4, 12))
    rows = []
    for seq in range(n):
        ts = data.draw(st.integers(0, 9), label=f"ts{seq}")
        key = data.draw(st.integers(0, 1), label=f"k{seq}")
        side = data.draw(st.sampled_from(["click", "purchase"]),
                         label=f"s{seq}")
        rows.append((ts, seq, key, side))
    rows.sort(key=lambda r: (r[0], r[1]))  # in-order delivery contract
    cut = data.draw(st.integers(1, n - 1), label="cut")
    drops = [rows[:cut], rows[cut:]]

    tmp = tmp_path_factory.mktemp("bindprop")
    src = tmp / "src"
    src.mkdir()
    now = __import__("time").time()
    for i, drop in enumerate(d for d in drops if d):
        pdf = pd.DataFrame(
            [{"ts": pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=4 * t),
              "event_id": s, "user_id": k, "event_type": side, "value": 1.0}
             for t, s, k, side in drop])
        d = tmp / f"f{i}"
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d))
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        os.replace(str(d / part), str(src / f"drop-{i}.parquet"))
        os.utime(str(src / f"drop-{i}.parquet"),
                 (now - 100 + i, now - 100 + i))
    stream = (spark.readStream
              .schema("ts timestamp, event_id long, user_id long, "
                      "event_type string, value double")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))

    class XY:
        def open(self):
            self.c = self.p = self.b = 0

        def add_cycle(self, cycle):
            hc = bool((cycle["side"] == "click").any())
            hp = bool((cycle["side"] == "purchase").any())
            self.c += int(hc)
            self.p += int(hp)
            self.b += int(hc and hp)

        def value(self):
            return {"nc": self.c, "np": self.p, "nb": self.b}

        def complete(self):
            pass

    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    out = run_available_now(live_bind(
        {"click": (clicks, ["value"]), "purchase": (purchases, ["value"])},
        ["user_id"], XY, "20 seconds", "nc long, np long, nb long"),
        "append")
    base = pd.Timestamp(2024, 1, 1)
    got = sorted(
        (r.user_id, int((r.ts - base).total_seconds()) // 4, r.event_id,
         r.nc, r.np, r.nb)
        for r in out.collect())
    want = [(k, ts, seq, c, p, b)
            for (k, ts, seq, c, p, b) in _bind_model(
                [(t, s, k, side) for t, s, k, side in rows], 5)]
    assert got == sorted(want)


@given(scores=st.lists(st.integers(-20, 20), min_size=0, max_size=24),
       nparts=st.integers(1, 6))
@SETTINGS
def test_global_rank_matches_sort_model(spark, scores, nparts):
    """global_rank == a pure-Python argsort on randomized scores (with
    duplicate score values — the id tiebreak must produce the exact
    total order) at every partition count, including partitions > rows
    and empty input."""
    from scespet_spark.operators.pipeline import global_rank
    rows = [(i, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id long, score long")
    got = {r.doc_id: r.rank for r in global_rank(
        df, [F.col("score").desc(), F.col("doc_id").asc()],
        num_partitions=nparts).collect()}
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
    want = {doc: pos + 1 for pos, doc in enumerate(order)}
    assert got == want


@given(docs=st.lists(st.lists(st.sampled_from("abc"), min_size=0,
                              max_size=12), min_size=1, max_size=6))
@SETTINGS
def test_gopher_repetition_matches_distinct_model(spark, docs):
    """gopher_repetition_filter's n-gram fractions == a pure-Python
    distinct-count model over the same rolled digests (tiny alphabet =
    heavy duplication, the adversarial case); short docs score 0."""
    from scespet_spark.operators.dedup import MH_PRIME, sh_coeff
    from scespet_spark.operators.text import gopher_repetition_filter
    import hashlib

    def h64(s):
        # first 15 hex chars of md5 (hashing.h64), then % MH_PRIME
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MH_PRIME

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_repetition_filter(df).collect()}
    for i, toks in enumerate(docs):
        hs = [h64(t) for t in toks if t]
        nt = len(hs)
        for n in (2, 3, 4):
            if nt >= n:
                grams = [sum(hs[p + j] * sh_coeff(j) for j in range(n))
                         % MH_PRIME for p in range(nt - n + 1)]
                want = round(1.0 - len(set(grams)) / (nt - n + 1), 6)
            else:
                want = 0.0
            assert got[i][f"dup_{n}gram_frac"] == want, (i, n)


@given(ntoks=st.lists(st.integers(1, 30), min_size=1, max_size=12),
       budget=st.integers(1, 120))
@SETTINGS
def test_token_budget_is_exact_prefix(spark, ntoks, budget):
    """token_budget_sample keeps EXACTLY the docs that start within
    the budget under the priority order — a deterministic prefix,
    never one doc more or fewer."""
    from scespet_spark.operators.text import token_budget_sample
    rows = [(i, "s", "w " * n, n) for i, n in enumerate(ntoks)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, prio long")
    got = sorted(r.doc_id for r in token_budget_sample(
        df, budget=budget, priority_col="prio").collect())
    order = sorted(range(len(ntoks)), key=lambda i: (-ntoks[i], i))
    want, cum = [], 0
    for i in order:
        if cum < budget:
            want.append(i)
        cum += ntoks[i]
    assert got == sorted(want)
