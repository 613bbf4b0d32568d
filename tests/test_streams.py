

def test_take_broadcast_state_matches_union_form(spark):
    """The broadcast-interval as-of strategy is value-identical to the
    union+window form, including same-(t, seq) visibility and nulls
    before the first state row."""
    from pyspark.sql import functions as F
    from scespet_spark.core.stream import Stream
    state = spark.createDataFrame(
        [(2, 1, "u", 10.0), (5, 2, "u", 20.0), (5, 3, "u", 30.0),
         (9, 4, "v", 99.0)],
        "t long, seq long, k string, sv double")
    fact = spark.createDataFrame(
        [(1, 10, "u", 0.1), (2, 11, "u", 0.2), (5, 12, "u", 0.5),
         (7, 13, "u", 0.7), (8, 14, "v", 0.8), (9, 15, "v", 0.9),
         (1, 16, "w", 1.0)],
        "t long, seq long, k string, fv double")
    ls = Stream(state, t="t", seq="seq", keys=("k",))
    rs = Stream(fact, t="t", seq="seq", keys=("k",))
    a = ls.take(rs, ["sv"], ["fv"]).df
    b = ls.take(rs, ["sv"], ["fv"], broadcast_state=True).df
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    lookup = {r[1]: r for r in rb}         # by seq
    assert lookup[10][3] is None           # before first state row
    assert lookup[11][3] == 10.0           # same-t state visible
    assert lookup[12][3] == 30.0           # latest of two same-t states
    assert lookup[16][3] is None           # key with no state


def test_take_rejects_broadcast_state_with_key_map(spark):
    import pytest
    from pyspark.sql import functions as F
    from scespet_spark.core.stream import Stream
    left = spark.createDataFrame([(1, 1, "u", 1.0)],
                                 "t long, seq long, k string, lv double")
    right = spark.createDataFrame([(2, 2, "U", 2.0)],
                                  "t long, seq long, k2 string, rv double")
    ls = Stream(left, t="t", seq="seq", keys=("k",))
    rs = Stream(right, t="t", seq="seq", keys=("k2",))
    with pytest.raises(ValueError, match="broadcast_state"):
        ls.take(rs, ["lv"], ["rv"], key_map=F.upper(F.col("k")),
                broadcast_state=True)
    with pytest.raises(ValueError, match="broadcast_state"):
        ls.sample(rs, ["lv"], key_map=F.upper(F.col("k")),
                  broadcast_state=True)


def test_load_csv_from_url(spark, tmp_path):
    """http(s) paths download through the driver-side cache and read
    like local files (the reference's URL trade-dump use case)."""
    import http.server
    import threading

    data = "10\t100.5\taapl\n20\t101.0\tmsft\n"
    (tmp_path / "trades.tsv").write_text(data)

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/trades.tsv"
        from scespet_spark.sources.batch import load_csv
        s = load_csv(spark, url, "ts long, px double, sym string")
        rows = sorted((r.ts, r.px, r.sym) for r in s.df.collect())
        assert rows == [(10, 100.5, "aapl"), (20, 101.0, "msft")]
        assert "seq" in s.df.columns  # synthesized tie-breaker
        # second load hits the cache (no re-download): same rows
        assert load_csv(spark, url,
                        "ts long, px double, sym string").df.count() == 2
    finally:
        srv.shutdown()
