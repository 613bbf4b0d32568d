"""Golden-sequence tests ported (as behavior, not code) from the reference
test suite — the semantics oracle for scan/reduce emission
(reference: test/programs/TestSingleTerms.scala, BucketStreamTest.scala;
harness style: test/scespet/util/ScespetTestBase.scala:26-43)."""

import pytest
from pyspark.sql import functions as F

from scespet_spark import AFTER, BEFORE, Count, Stream, Termination, Trigger


def _stream(spark, values, schema="ts long, seq long, val long"):
    rows = [(i, i, v) for i, v in enumerate(values)]
    return Stream(spark.createDataFrame(rows, schema), t="ts", seq="seq")


def _col(df, name, order=("ts", "seq")):
    return [row[name] for row in df.orderBy(*order).collect()]


def test_map_mult(spark):
    # TestSingleTerms "stream increment"
    s = _stream(spark, list(range(21))).map(out=F.col("val") * 1000)
    assert _col(s.df, "out") == [v * 1000 for v in range(21)]


def test_filter(spark):
    s = _stream(spark, [1, 2, 3, 4, 5, 6]).filter(F.col("val") % 2 == 0)
    assert _col(s.df, "val") == [2, 4, 6]


def test_grouped_reduce_count_slice(spark):
    # TestSingleTerms "reduce each": 1..11 grouped by 3 events -> 6,15,24,21
    # (final partial bucket flushes at termination)
    s = _stream(spark, list(range(1, 12)))
    out = s.group(Count(3)).reduce(s=F.sum("val"))
    assert _col(out.df, "s") == [6, 15, 24, 21]


def test_grouped_scan_count_slice(spark):
    # TestSingleTerms "fold each": eleven 2s grouped by 3 -> 2,4,6 | ... | 2,4
    s = _stream(spark, [2] * 11)
    out = s.group(Count(3)).scan(s=F.sum("val"))
    assert _col(out.df, "s") == [2, 4, 6, 2, 4, 6, 2, 4, 6, 2, 4]


def test_reduce_all(spark):
    # TestSingleTerms "reduce_all": one value at termination
    s = _stream(spark, [1, 1, 1, 1, 1, 1])
    assert s.reduce(F.count("*").alias("n")).collect()[0].n == 6


def test_scan_append(spark):
    # BucketStreamTest "scan": running collect over "abcdefghijk"
    data = "abcdefghijk"
    s = _stream(spark, list(data), "ts long, seq long, val string")
    out = s.scan(cs=F.collect_list("val"))
    assert ["".join(v) for v in _col(out.df, "cs")] == [data[: i + 1] for i in range(len(data))]


def test_slice_before(spark):
    # TestSingleTerms "slice before": boundary event starts the new bucket
    s = _stream(spark, [1, 1, 1, 10, 1, 1, 1])
    trig = Trigger(F.col("val") == 10, BEFORE)
    assert _col(s.group(trig).scan(s=F.sum("val")).df, "s") == [1, 2, 3, 10, 11, 12, 13]
    assert _col(s.group(trig).reduce(s=F.sum("val")).df, "s") == [3, 13]


def test_slice_after(spark):
    # TestSingleTerms "slice after": boundary event closes the old bucket
    s = _stream(spark, [1, 1, 1, 10, 1, 1, 1])
    trig = Trigger(F.col("val") == 10, AFTER)
    assert _col(s.group(trig).scan(s=F.sum("val")).df, "s") == [1, 2, 3, 13, 1, 2, 3]
    assert _col(s.group(trig).reduce(s=F.sum("val")).df, "s") == [13, 3]


def test_termination_slice(spark):
    s = _stream(spark, [1, 2, 3])
    out = s.group(Termination()).reduce(s=F.sum("val"))
    assert _col(out.df, "s") == [6]


def test_window_scan_and_reduce(spark):
    # BucketStreamTest "window scan"/"windowed reduce":
    # data "abcdefghijk", in-window indices 0-2 and 5-8
    data = "abcdefghijk"
    inwin = set(range(0, 3)) | set(range(5, 9))
    rows = [(i, i, c, i in inwin) for i, c in enumerate(data)]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, c string, g boolean"),
               t="ts", seq="seq")
    scan = s.window(F.col("g")).scan(cs=F.collect_list("c"))
    assert ["".join(v) for v in _col(scan.df, "cs")] == [
        "a", "ab", "abc", "f", "fg", "fgh", "fghi"]
    red = s.window(F.col("g")).reduce(cs=F.collect_list("c"))
    assert ["".join(v) for v in _col(red.df, "cs", order=("ts",))] == ["abc", "fghi"]


def test_window_open_at_termination_does_not_emit(spark):
    # TestSingleTerms "reduce while": trailing Open..data never emits
    data = "abcdefghijk"
    gate = lambda i: i in range(0, 3) or i >= 9  # second window never closes
    rows = [(i, i, c, gate(i)) for i, c in enumerate(data)]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, c string, g boolean"),
               t="ts", seq="seq")
    red = s.window(F.col("g")).reduce(cs=F.collect_list("c"))
    assert ["".join(v) for v in _col(red.df, "cs", order=("ts",))] == ["abc"]


def test_window_from_separate_gate_stream_close_beats_data(spark):
    # gate stream: open at t=1, close at t=5; data at t=5 must be EXCLUDED
    # (close-beats-data, WindowedBucket_LastValue.scala:10-11), data at the
    # open timestamp t=1 included.
    data = Stream(spark.createDataFrame(
        [(t, 100 + t, t) for t in range(8)], "ts long, seq long, v long"),
        t="ts", seq="seq")
    gate = Stream(spark.createDataFrame(
        [(1, 0, True), (5, 1, False)], "ts long, seq long, g boolean"),
        t="ts", seq="seq")
    red = data.window_from(gate, "g").reduce(vs=F.collect_list("v"))
    assert _col(red.df, "vs", order=("ts",)) == [[1, 2, 3, 4]]


def test_filter_type(spark):
    # TestSingleTerms "filterType" via a discriminator column
    rows = [(i, i, t, v) for i, (t, v) in enumerate(
        [("int", 1), ("str", None), ("int", 2), ("str", None), ("int", 3)])]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, type string, v long"),
               t="ts", seq="seq")
    out = s.filter_type("type", "int", fields=["v"])
    assert _col(out.df, "v") == [1, 2, 3]


def test_by_keyed_scan(spark):
    # demux then per-key running sum (TestMultiTerms-style)
    s = _stream(spark, [1, 2, 3, 4, 5, 6]).by(
        F.when(F.col("val") % 2 == 0, "even").otherwise("odd"))
    out = s.scan(cum=F.sum("val"))
    got = [(r.key, r.cum) for r in out.df.orderBy("ts").collect()]
    assert got == [("odd", 1), ("even", 2), ("odd", 4), ("even", 6), ("odd", 9), ("even", 12)]


def test_keyed_count_slice_is_per_key(spark):
    # BucketVectStreamTest-style: count windows tick per key
    s = _stream(spark, [1, 2, 3, 4, 5, 6, 7, 8]).by(F.col("val") % 2)
    out = s.group(Count(2)).reduce(s=F.sum("val"))
    got = sorted((r.key, r.s) for r in out.df.collect())
    assert got == [(0, 6), (0, 14), (1, 4), (1, 12)]


def test_value_set(spark):
    # BucketStreamTest "scan non agg": distinct-set growth events only
    s = _stream(spark, list("abab"), "ts long, seq long, val string")
    out = s.value_set(F.array("val"), name="v")
    assert _col(out.df, "v") == ["a", "b"]


def test_map_keys_and_subset(spark):
    s = _stream(spark, [1, 2, 3, 4]).by(F.col("val"))
    rekeyed = s.map_keys(F.when(F.col("key") <= 2, F.col("key") + 100))
    assert _col(rekeyed.df, "key") == [101, 102]
    sub = s.subset(F.col("key") > 2)
    assert _col(sub.df, "key") == [3, 4]


def test_zip_take_sample(spark):
    xs = Stream(spark.createDataFrame([(0, 0, 1.0), (2, 2, 2.0), (4, 4, 3.0)],
                                      "ts long, seq long, x double"), t="ts", seq="seq")
    ys = Stream(spark.createDataFrame([(1, 1, 10.0), (3, 3, 20.0)],
                                      "ts long, seq long, y double"), t="ts", seq="seq")
    zipped = [(r.ts, r.x, r.y) for r in xs.zip_join(ys, ["x"], ["y"]).df.orderBy("ts").collect()]
    # before y's first event its value is null (VectorJoin.scala:55-66)
    assert zipped == [(0, 1.0, None), (1, 1.0, 10.0), (2, 2.0, 10.0),
                      (3, 2.0, 20.0), (4, 3.0, 20.0)]
    taken = [(r.ts, r.x, r.y) for r in xs.take(ys, ["x"], ["y"]).df.orderBy("ts").collect()]
    assert taken == [(1, 1.0, 10.0), (3, 2.0, 20.0)]
    sampled = [(r.ts, r.x) for r in xs.sample(ys, ["x"]).df.orderBy("ts").collect()]
    assert sampled == [(1, 1.0), (3, 2.0)]


def test_keyed_zip_join(spark):
    xs = Stream(spark.createDataFrame(
        [(0, 0, "a", 1.0), (1, 1, "b", 2.0), (4, 4, "a", 3.0)],
        "ts long, seq long, key string, x double"), t="ts", seq="seq", keys=("key",))
    ys = Stream(spark.createDataFrame(
        [(2, 2, "a", 10.0), (3, 3, "b", 20.0)],
        "ts long, seq long, key string, y double"), t="ts", seq="seq", keys=("key",))
    got = [(r.ts, r.key, r.x, r.y)
           for r in xs.zip_join(ys, ["x"], ["y"]).df.orderBy("ts").collect()]
    assert got == [(0, "a", 1.0, None), (1, "b", 2.0, None),
                   (2, "a", 1.0, 10.0), (3, "b", 2.0, 20.0), (4, "a", 3.0, 10.0)]


def test_scalable_global_scan_matches_plain(spark):
    rows = [(i, i, (i * 7) % 13) for i in range(200)]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, val long"), t="ts", seq="seq")
    plain = _col(s.scan(cum=F.sum("val")).df, "cum")
    bucketed = _col(
        s.scan(buckets=(F.col("ts") / F.lit(16)).cast("long"), cum=F.sum("val")).df, "cum")
    assert plain == bucketed


def test_scalable_scan_negative_values(spark):
    # non-monotone running sum (negative deltas): bucket totals must come
    # from the bucket's LAST row, not F.max of the running column
    rows = [(i, i, (-1) ** i * ((i * 7) % 13)) for i in range(200)]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, val long"), t="ts", seq="seq")
    plain = _col(s.scan(cum=F.sum("val")).df, "cum")
    bucketed = _col(
        s.scan(buckets=(F.col("ts") / F.lit(16)).cast("long"), cum=F.sum("val")).df, "cum")
    assert plain == bucketed


def test_map_vector_cross_key_count(spark):
    # mapVector: function of the whole vector at each event (VectTerm.scala:145-176)
    s = _stream(spark, [5, 6, 7]).by(F.col("val"))
    out = s.map_vector(n=F.count("*"))
    assert _col(out.df, "n") == [1, 2, 3]


def test_map_vector_bucketed_matches_plain(spark):
    # two-phase cross-key running agg (sum + max merges) == global window
    rows = [(i, i, i % 4, (-1) ** i * ((i * 5) % 17)) for i in range(160)]
    s = Stream(spark.createDataFrame(
        rows, "ts long, seq long, k long, v long"),
        t="ts", seq="seq", keys=("k",))
    plain = sorted((r.seq, r.n, r.vmax) for r in s.map_vector(
        n=F.count("*"), vmax=F.max("v")).df.collect())
    bucketed = sorted((r.seq, r.n, r.vmax) for r in s.map_vector(
        buckets=(F.col("ts") / F.lit(16)).cast("long"),
        merge={"vmax": "max"},
        n=F.count("*"), vmax=F.max("v")).df.collect())
    assert plain == bucketed


def test_key_list_growth(spark):
    s = _stream(spark, [2, 1, 2, 3]).by(F.col("val"))
    out = s.key_list()
    assert _col(out.df, "keys") == [[2], [1, 2], [1, 2], [1, 2, 3]]


def test_ewma_keyed_fewer_keys_than_partitions(spark):
    # the mapInPandas fold must tolerate empty partitions
    # (repartition(n, key) with 2 keys and 8-way parallelism)
    from scespet_spark.functions.reducers import ewma
    rows = [(i, i, "a" if i % 2 else "b", float(i)) for i in range(10)]
    s = Stream(spark.createDataFrame(
        rows, "ts long, seq long, key string, v double"),
        t="ts", seq="seq", keys=("key",))
    out = {(r.key, r.ts): r.ewma
           for r in ewma(s, "v", alpha=0.5).df.collect()}
    # per-key recurrence seeded from first value: b: 0,2,4,... a: 1,3,5,...
    expect, y = {}, {}
    for i in range(10):
        k = "a" if i % 2 else "b"
        y[k] = float(i) if k not in y else 0.5 * i + 0.5 * y[k]
        expect[(k, i)] = y[k]
    assert out == pytest.approx(expect)


def test_scalable_keyed_scan_matches_plain(spark):
    # two-phase bucketed scan must equal the plain per-key running scan
    # (the skewed-key scale path)
    rows = [(i, i, i % 3, (i * 5) % 11) for i in range(120)]
    s = Stream(spark.createDataFrame(
        rows, "ts long, seq long, k long, v long"),
        t="ts", seq="seq", keys=("k",))
    plain = sorted((r.k, r.seq, r.c) for r in s.scan(c=F.sum("v")).df.collect())
    bucketed = sorted((r.k, r.seq, r.c) for r in s.scan(
        buckets=(F.col("ts") / F.lit(16)).cast("long"),
        c=F.sum("v")).df.collect())
    assert plain == bucketed


def test_write_partitioned_roundtrip(spark, tmp_path):
    from scespet_spark.sources.batch import write_partitioned
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, p long, v double")
    out = str(tmp_path / "out")
    write_partitioned(df, out, partition_cols=("p",), sort_within=("id",))
    back = spark.read.parquet(out)
    assert back.count() == 30
    assert sorted(r.p for r in back.select("p").distinct().collect()) == [0, 1, 2]
    import os
    assert sorted(d for d in os.listdir(out) if d.startswith("p=")) == [
        "p=0", "p=1", "p=2"]


def test_write_partitioned_orc_roundtrip(spark, tmp_path):
    import pytest as _pytest
    from scespet_spark.sources.batch import load_columnar, write_partitioned
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(20)], "ts long, p long, v double")
    out = str(tmp_path / "orc_out")
    write_partitioned(df, out, partition_cols=("p",), fmt="orc")
    s = load_columnar(spark, out, fmt="orc")
    assert s.df.count() == 20
    assert "seq" in s.df.columns  # replay tie-breaker synthesized
    assert {r.p for r in s.df.select("p").distinct().collect()} == {0, 1}
    with _pytest.raises(ValueError, match="unsupported"):
        write_partitioned(df, out, fmt="avro")
    with _pytest.raises(ValueError, match="unsupported"):
        load_columnar(spark, out, fmt="avro")


def test_keymap_zip_join_multi_map_raises(spark):
    # VectorJoin.scala:38-40: a left cell bound to multiple right cells
    xs = Stream(spark.createDataFrame(
        [(0, 0, 1, 1.0)], "ts long, seq long, k long, x double"),
        t="ts", seq="seq", keys=("k",))
    ys = Stream(spark.createDataFrame(
        [(0, 0, 7, 2.0)], "ts long, seq long, k2 long, y double"),
        t="ts", seq="seq", keys=("k2",))
    with pytest.raises(ValueError, match="multiple right keys"):
        xs.zip_join(ys, ["x"], ["y"], key_map=[(1, 7), (1, 8)])


def test_keymap_zip_join_semantics(spark):
    # left cells k=1,2 both bind right cell k2=10 (many-to-one allowed);
    # a right event fires every LIVE left cell; right history before a
    # cell's first event is visible at bind time but emits nothing
    xs = Stream(spark.createDataFrame(
        [(1, 1, 1, 1.0), (4, 4, 2, 4.0), (6, 6, 1, 6.0)],
        "ts long, seq long, k long, x double"), t="ts", seq="seq", keys=("k",))
    ys = Stream(spark.createDataFrame(
        [(0, 0, 10, 100.0), (2, 2, 10, 200.0), (5, 5, 11, 999.0)],
        "ts long, seq long, k2 long, y double"), t="ts", seq="seq", keys=("k2",))
    out = xs.zip_join(ys, ["x"], ["y"], key_map={1: 10, 2: 10})
    got = sorted((r.ts, r.k, r.x, r.y) for r in out.df.collect())
    # t=0 y fires: no live cell -> nothing. t=1 x(k=1): y latest=100.
    # t=2 y fires: cell k=1 live -> (1, x=1, y=200). t=4 x(k=2): bind-time
    # y=200. t=5 y(k2=11): bound to nothing. t=6 x(k=1): y still 200.
    assert got == [(1, 1, 1.0, 100.0), (2, 1, 1.0, 200.0),
                   (4, 2, 4.0, 200.0), (6, 1, 6.0, 200.0)]


def test_keymap_take_emits_on_right_only(spark):
    xs = Stream(spark.createDataFrame(
        [(1, 1, 1, 1.0), (6, 6, 1, 6.0)],
        "ts long, seq long, k long, x double"), t="ts", seq="seq", keys=("k",))
    ys = Stream(spark.createDataFrame(
        [(0, 0, 10, 100.0), (2, 2, 10, 200.0)],
        "ts long, seq long, k2 long, y double"), t="ts", seq="seq", keys=("k2",))
    out = xs.take(ys, ["x"], ["y"], key_map={1: 10})
    got = sorted((r.ts, r.k, r.x, r.y) for r in out.df.collect())
    # only right (y) events emit, and only once the cell is live:
    # t=0 no cell yet -> nothing; t=2 -> (x latest=1, y=200)
    assert got == [(2, 1, 1.0, 200.0)]


def test_load_jsonl_source(spark, tmp_path):
    from scespet_spark.sources.batch import load_jsonl
    p = tmp_path / "docs.jsonl"
    p.write_text('{"ts": 1, "doc_id": 10, "text": "hello world"}\n'
                 '{"ts": 2, "doc_id": 11, "text": "second doc"}\n')
    s = load_jsonl(spark, str(p), schema="ts long, doc_id long, text string")
    rows = s.df.orderBy("ts").collect()
    assert [(r.ts, r.doc_id, r.text) for r in rows] == [
        (1, 10, "hello world"), (2, 11, "second doc")]
    # schema'd scan: no inference pass, columns typed as declared
    assert dict(s.df.dtypes)["doc_id"] == "bigint"


def test_key_list_at_matches_windowed_form(spark):
    # the sampled (first-seen range-join) form must equal the running
    # windowed key_list at the sampled events, ties included
    rows = [(0, 0, 5), (1, 1, 3), (1, 2, 7), (4, 3, 3), (6, 4, 1)]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, k long"),
               t="ts", seq="seq").by(F.col("k"), name="k")
    spine = Stream(spark.createDataFrame(
        [(1, 1), (5, 9), (6, 4)], "ts long, seq long"), t="ts", seq="seq")
    got = {(r.ts, r.seq): r.keys for r in s.key_list_at(spine).df.collect()}
    windowed = {(r.ts, r.seq): r.keys for r in s.key_list().df.collect()}
    assert got[(1, 1)] == windowed[(1, 1)] == [3, 5]
    assert got[(5, 9)] == [3, 5, 7]          # between events: all seen by t=5
    assert got[(6, 4)] == windowed[(6, 4)] == [1, 3, 5, 7]


def test_key_list_at_spine_before_first_key(spark):
    # a spine event earlier than every first-seen emits an EMPTY list row
    # (left join), so the output is always S rows
    rows = [(5, 5, 1), (7, 7, 2)]
    s = Stream(spark.createDataFrame(rows, "ts long, seq long, k long"),
               t="ts", seq="seq").by(F.col("k"), name="k")
    spine = Stream(spark.createDataFrame(
        [(0, 0), (6, 6)], "ts long, seq long"), t="ts", seq="seq")
    got = {(r.ts, r.seq): r.keys for r in s.key_list_at(spine).df.collect()}
    assert got == {(0, 0): [], (6, 6): [1]}


def test_scalable_scan_merge_key_validation(spark):
    s = _stream(spark, [1, 2, 3])
    # a merge entry naming a non-existent aggregate is a typo, not a noop
    with pytest.raises(ValueError, match="unknown aggregates"):
        s.scan(buckets=F.col("ts"), merge={"vmx": "max"}, vmax=F.max("val"))
    # an extremum aggregate without an explicit merge kind would silently
    # SUM bucket maxima — refuse instead
    with pytest.raises(ValueError, match="no merge kind"):
        s.scan(buckets=F.col("ts"), vmax=F.max("val"))


def test_keymap_zip_join_null_left_values_still_emit(spark):
    # a cell is live from the key's FIRST event regardless of value
    # nullness: legitimately-null left values must not suppress emissions
    xs = Stream(spark.createDataFrame(
        [(1, 1, 1, None), (6, 6, 1, 6.0)],
        "ts long, seq long, k long, x double"), t="ts", seq="seq", keys=("k",))
    ys = Stream(spark.createDataFrame(
        [(0, 0, 10, 100.0), (2, 2, 10, 200.0)],
        "ts long, seq long, k2 long, y double"), t="ts", seq="seq", keys=("k2",))
    out = xs.zip_join(ys, ["x"], ["y"], key_map={1: 10})
    got = sorted((r.ts, r.k, r.x, r.y) for r in out.df.collect())
    # t=0: no cell yet. t=1: x fires (null value), y latest = 100.
    # t=2: y fires the live cell (x still null). t=6: x=6 fires.
    assert got == [(1, 1, None, 100.0), (2, 1, None, 200.0),
                   (6, 1, 6.0, 200.0)]


def test_keymap_column_form_multi_map_raises(spark):
    # the Column key_map form must also hit the multi-map guard when a
    # row-dependent expression binds one left key to several right keys
    xs = Stream(spark.createDataFrame(
        [(0, 0, 1, 1.0), (1, 1, 1, 2.0)],
        "ts long, seq long, k long, x double"), t="ts", seq="seq", keys=("k",))
    ys = Stream(spark.createDataFrame(
        [(0, 0, 10, 5.0), (1, 1, 11, 7.0)],
        "ts long, seq long, k2 long, y double"), t="ts", seq="seq", keys=("k2",))
    out = xs.zip_join(ys, ["x"], ["y"],
                      key_map=F.col("k") * 10 + F.col("seq"))
    with pytest.raises(Exception, match="multiple right keys"):
        out.df.collect()


def test_ewma_whale_key_spanning_batches(spark):
    # one whale key whose history spans many Arrow batches must compute
    # the identical recurrence via the per-batch carry (bounded memory),
    # bit-equal to the unbroken pandas fold
    from scespet_spark.functions.reducers import ewma
    import pandas as pd
    rows = [(i, i, "whale" if i % 50 else "minnow", float((i * 7) % 23))
            for i in range(500)]
    s = Stream(spark.createDataFrame(
        rows, "ts long, seq long, key string, v double"),
        t="ts", seq="seq", keys=("key",))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        got = {(r.key, r.ts): r.ewma
               for r in ewma(s, "v", alpha=0.25).df.collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pdf = pd.DataFrame(rows, columns=["ts", "seq", "key", "v"])
    expect = pdf.groupby("key")["v"].transform(
        lambda x: x.ewm(alpha=0.25, adjust=False).mean())
    for (_, r), e in zip(pdf.iterrows(), expect):
        assert got[(r.key, r.ts)] == e, (r.key, r.ts)


def test_keymap_take_equals_zip_emit_right_form(spark):
    # the compact interval-join take must emit exactly the rows the
    # replicate-then-window zip form would keep for side=right
    import random
    from scespet_spark.core.stream import _keymap_zip_join
    rng = random.Random(5)
    lrows = [(rng.randrange(50), i, rng.randrange(8), float(i))
             for i in range(120)]
    rrows = [(rng.randrange(50), 1000 + i, rng.randrange(4), 100.0 + i)
             for i in range(80)]
    xs = Stream(spark.createDataFrame(
        lrows, "ts long, seq long, k long, x double"),
        t="ts", seq="seq", keys=("k",))
    ys = Stream(spark.createDataFrame(
        rrows, "ts long, seq long, k2 long, y double"),
        t="ts", seq="seq", keys=("k2",))
    km = F.col("k") % 4
    compact = xs.take(ys, ["x"], ["y"], key_map=km).df
    fanout = _keymap_zip_join(xs, ys, ["x"], ["y"], km, emit="right").df
    a = sorted(map(tuple, compact.select("ts", "seq", "k", "x", "y").collect()))
    b = sorted(map(tuple, fanout.select("ts", "seq", "k", "x", "y").collect()))
    assert a == b and len(a) > 0


def test_ewma_global_two_phase_multi_partition(spark):
    # the buckets= path replaces repartition(1) with parallel per-bucket
    # folds + driver-composed carries.  On mantissa-bounded data (alpha
    # 0.5, 0/1 values, short series) every op is exact dyadic arithmetic
    # and the result is BIT-identical to the monolithic fold; on random
    # doubles the only deviation is carry-composition rounding (~ulps).
    import random
    from scespet_spark.functions.reducers import ewma
    rows = [(i, i, float(i % 2)) for i in range(40)]
    s = Stream(spark.createDataFrame(rows, "t long, seq long, v double"),
               t="t", seq="seq")
    mono = [r.ewma for r in ewma(s, "v", 0.5).df.orderBy("seq").collect()]
    bucketed = ewma(s, "v", 0.5, buckets=(F.col("t") / 10).cast("long"))
    assert bucketed.df.rdd.getNumPartitions() > 1     # not repartition(1)
    two = [r.ewma for r in bucketed.df.orderBy("seq").collect()]
    assert two == mono                                # bit-identical

    rng = random.Random(9)
    rows2 = [(i, i, rng.random() * 100) for i in range(400)]
    s2 = Stream(spark.createDataFrame(rows2, "t long, seq long, v double"),
                t="t", seq="seq")
    m2 = [r.ewma for r in ewma(s2, "v", 0.3).df.orderBy("seq").collect()]
    t2 = [r.ewma for r in
          ewma(s2, "v", 0.3, buckets=(F.col("t") / 50).cast("long"))
          .df.orderBy("seq").collect()]
    assert max(abs(a - b) / max(abs(a), 1e-9)
               for a, b in zip(m2, t2)) < 1e-12


def test_ewma_keyed_rejects_buckets(spark):
    import pytest as _pytest
    from scespet_spark.functions.reducers import ewma
    s = Stream(spark.createDataFrame([(0, 0, 1, 1.0)],
                                     "t long, seq long, k long, v double"),
               t="t", seq="seq", keys=("k",))
    with _pytest.raises(ValueError, match="unkeyed"):
        ewma(s, "v", 0.5, buckets=F.col("t"))


def test_ewma_nulls_skip_without_decay(spark):
    # a null value is "no event": it emits the previous mean, consumes
    # no decay step, and must not poison the fold — in BOTH the
    # monolithic and the bucketed two-phase paths, including a null as
    # the globally-first row (the seed is the first NON-null value)
    from scespet_spark.functions.reducers import ewma
    vals = [None, 1.0, None, 3.0, None, None, 5.0, 7.0]
    rows = [(i, i, v) for i, v in enumerate(vals)]
    s = Stream(spark.createDataFrame(rows, "t long, seq long, v double"),
               t="t", seq="seq")
    mono = [r.ewma for r in ewma(s, "v", 0.5).df.orderBy("seq").collect()]
    two = [r.ewma for r in
           ewma(s, "v", 0.5, buckets=(F.col("t") / 3).cast("long"))
           .df.orderBy("seq").collect()]
    # skip-null recurrence by hand: seed 1.0; 3 -> 2.0; 5 -> 3.5; 7 -> 5.25
    want = [None, 1.0, 1.0, 2.0, 2.0, 2.0, 3.5, 5.25]
    assert mono == want
    assert two == want


def test_ewma_bucketed_leading_null_bucket(spark):
    # an ENTIRELY-null leading bucket must pass the null state through
    # (emissions null until the first real value, later buckets seeded
    # from the first real bucket) — the x1 seed comes from phase 1's
    # per-bucket first values, not a min_by over possibly-null rows
    from scespet_spark.functions.reducers import ewma
    vals = [None, None, None, 4.0, 8.0, 2.0]
    rows = [(i, i, v) for i, v in enumerate(vals)]
    s = Stream(spark.createDataFrame(rows, "t long, seq long, v double"),
               t="t", seq="seq")
    two = [r.ewma for r in
           ewma(s, "v", 0.5, buckets=(F.col("t") / 3).cast("long"))
           .df.orderBy("seq").collect()]
    assert two == [None, None, None, 4.0, 6.0, 4.0]


def test_zip_join_null_value_is_a_real_update(spark):
    # a left event whose VALUE is null must make "latest" null (the live
    # zip state already does) — not resurrect the previous value: the
    # padding-vs-payload distinction rides a marker struct in the union
    rows = [(1, 1, 0, 5.0, None), (2, 2, 0, None, None),
            (3, 3, 1, None, 7.0)]
    df = spark.createDataFrame(
        rows, "t long, seq long, side int, lv double, rv double")
    lt = Stream(df.filter("side = 0").select("t", "seq", "lv"),
                t="t", seq="seq")
    rt = Stream(df.filter("side = 1").select("t", "seq", "rv"),
                t="t", seq="seq")
    out = lt.take(rt, ["lv"], ["rv"]).df.collect()
    assert len(out) == 1
    assert out[0].lv is None  # t=2's null update is visible, not 5.0
    assert out[0].rv == 7.0
    both = lt.zip_join(rt, ["lv"], ["rv"]).df.orderBy("seq").collect()
    assert [r.lv for r in both] == [5.0, None, None]


def test_reduce_emission_names_a_real_row(spark):
    # emission (t, seq) must be the PAIR of the bucket's last event in
    # (t, seq) order — independent max(t)/max(seq) would fabricate
    # (t=2, seq=100) here, a row that does not exist
    rows = [(1, 100, 1.0), (2, 5, 2.0)]
    s = Stream(spark.createDataFrame(rows, "t long, seq long, v double"),
               t="t", seq="seq")
    out = s.group(Termination()).reduce(total=F.sum("v")).df.collect()
    assert (out[0].t, out[0].seq) == (2, 5)
    assert out[0].total == 3.0


def test_scalable_scan_keeps_null_bucket_rows(spark):
    # a bucket expression evaluating to null (e.g. derived from a null
    # column) must not silently DROP those rows from the output — the
    # plain scan keeps them (nulls order first)
    rows = [(None, 0, 1.0), (1, 1, 2.0), (2, 2, 3.0), (3, 3, 4.0)]
    df = spark.createDataFrame(rows, "b long, seq long, v double") \
        .withColumn("t", F.coalesce(F.col("b"), F.lit(0)))
    s = Stream(df, t="t", seq="seq")
    out = s.scan(buckets=F.col("b"), total=F.sum("v")).df
    assert out.count() == 4
    got = {r.seq: r.total for r in out.collect()}
    assert got[0] == 1.0  # the null-bucket row survives with its prefix


def test_from_parquet_nanos_ts_optin(spark, tmp_path):
    import pyspark.sql.functions as SF
    p = str(tmp_path / "ev")
    spark.createDataFrame([(86_400_000_000_000, 1, 2.0)],
                          "ts long, seq long, v double") \
        .write.parquet(p)
    s = Stream.from_parquet(spark, p, t="ts", seq="seq", nanos_ts=True)
    row = s.df.collect()[0]
    assert str(row.ts) == "1970-01-02 00:00:00"  # nanos -> micros
    plain = Stream.from_parquet(spark, p, t="ts", seq="seq")
    assert plain.df.schema["ts"].dataType.simpleString() == "bigint"


def test_ewma_null_group_key_rows_fold_as_own_group(spark):
    """Rows whose group KEY is null must fold as their own group (the
    same grouping a window partitionBy gives them) — never emit
    uninitialized values (pandas groupby drops NaN keys by default)."""
    from scespet_spark.core.stream import Stream
    from scespet_spark.functions.reducers import ewma
    rows = [(0, 0, None, 10.0), (1, 1, 7, 2.0), (2, 2, None, 20.0),
            (3, 3, 7, 4.0)]
    df = spark.createDataFrame(
        rows, "ts long, event_id long, user_id long, value double")
    s = Stream(df, t="ts", seq="event_id", keys=("user_id",))
    out = {r.event_id: r.e for r in
           ewma(s, "value", alpha=0.5, out="e").df.collect()}
    # null-key group: y0=10, y1=.5*20+.5*10=15; key-7 group: y0=2, y1=3
    assert out[0] == 10.0 and out[2] == 15.0
    assert out[1] == 2.0 and out[3] == 3.0


def test_write_jsonl_roundtrip(spark, tmp_path):
    from scespet_spark.sources.batch import load_jsonl, write_jsonl
    df = spark.createDataFrame(
        [(i, i % 2, f"doc {i}", float(i)) for i in range(12)],
        "ts long, p long, text string, v double")
    out = str(tmp_path / "jsonl_out")
    write_jsonl(df, out, partition_cols=("p",))
    back = load_jsonl(spark, out + "/*/*.json",
                      schema="ts long, text string, v double")
    assert back.df.count() == 12
    assert {r.text for r in back.df.select("text").collect()} == \
        {f"doc {i}" for i in range(12)}


def test_write_partitioned_zorder_roundtrip(spark, tmp_path):
    import pytest as _pytest
    from scespet_spark.sources.batch import write_partitioned
    df = spark.createDataFrame(
        [(i, i % 2, float(i % 7), float(i % 11)) for i in range(200)],
        "id long, p long, x double, y double")
    out = str(tmp_path / "zout")
    write_partitioned(df, out, partition_cols=("p",),
                      zorder_by=("x", "y"), zorder_bits=8)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert "__z" not in back.columns        # layout key never persisted
    assert sorted(back.columns) == ["id", "p", "x", "y"]
    with _pytest.raises(ValueError, match="mutually exclusive"):
        write_partitioned(df, out, sort_within=("id",), zorder_by=("x",))
