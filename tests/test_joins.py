"""Skew-salted and bucket-co-located join strategies: value parity with
the plain join plus the plan properties that matter at scale."""

import pytest
from pyspark.sql import functions as F

from scespet_spark.operators.joins import salted_join, write_bucketed


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows hit key 0
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7)
         .alias("k"),
        F.col("id").alias("fid"))
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "k long, dval string")
    return fact, dim


def test_salted_join_matches_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").select("fid", "dval")
    salted = salted_join(fact, dim, ["k"], salt=8).select("fid", "dval")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_spreads_hot_key(skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, ["k"], salt=8)
    # before the drop, the hot key's rows carry >1 distinct salt value
    pre = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "fid"), F.lit(8)).cast("int"))
    n_salts = (pre.filter(F.col("k") == 0)
               .select("__salt").distinct().count())
    assert n_salts > 1
    assert out.count() == fact.join(dim, "k").count()


def test_salted_join_deterministic(skewed):
    fact, dim = skewed
    a = sorted(salted_join(fact, dim, ["k"], salt=4).collect())
    b = sorted(salted_join(fact, dim, ["k"], salt=4).collect())
    assert a == b


def test_salted_join_left_outer(skewed):
    fact, dim = skewed
    # keys 0..6 all present in dim -> outer equals inner here; add a miss
    fact2 = fact.union(fact.sparkSession.createDataFrame(
        [(99, 12345)], "k long, fid long"))
    out = salted_join(fact2, dim, ["k"], salt=4, how="left")
    miss = out.filter(F.col("k") == 99).collect()
    assert len(miss) == 1 and miss[0].dval is None


def test_salted_join_rejects_bad_salt(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], salt=0)


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    a = spark.range(1000).select(F.col("id").alias("k"),
                                 (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "t_buck_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "t_buck_b", ["k"], n_buckets=8, sort_cols=["k"])
    ta, tb = spark.table("t_buck_a"), spark.table("t_buck_b")
    joined = ta.join(tb.hint("merge"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # co-located: bucket metadata aligns
    assert joined.count() == 1000
    row = joined.filter(F.col("k") == 10).collect()[0]
    assert (row.va, row.vb) == (20, 30)


def test_salted_join_rejects_dim_preserving_how(skewed):
    # right/full outer would emit up to salt x unmatched dim replicas
    fact, dim = skewed
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(fact, dim, ["k"], salt=4, how=how)


# ---------------------------------------------------------------------------
# range/interval join via bucket expansion (late r9)
# ---------------------------------------------------------------------------

from scespet_spark.operators.joins import range_join


def _bands(spark):
    # overlapping bands: [0,15), [10,25), [20,35), [30,45)
    return spark.createDataFrame(
        [(i, i * 10.0, i * 10.0 + 15.0) for i in range(4)],
        "band long, lo double, hi double")


def test_range_join_matches_between_semantics(spark):
    facts = spark.createDataFrame([(i, float(i)) for i in range(45)],
                                  "fid long, v double")
    got = {(r.fid, r.band)
           for r in range_join(facts, _bands(spark), "v",
                               bucket_width=7.0).collect()}
    exp = {(i, b) for i in range(45) for b in range(4)
           if b * 10.0 <= i < b * 10.0 + 15.0}
    assert got == exp
    # inferred bucket_width gives the same rows
    got2 = {(r.fid, r.band)
            for r in range_join(facts, _bands(spark), "v").collect()}
    assert got2 == exp


def test_range_join_hi_exclusive_on_bucket_boundary(spark):
    # interval ending exactly on a bucket edge must not admit hi
    dim = spark.createDataFrame([(0, 0.0, 10.0)],
                                "band long, lo double, hi double")
    facts = spark.createDataFrame(
        [(0, 10.0), (1, 9.999), (2, 0.0), (3, -0.001)],
        "fid long, v double")
    got = sorted(r.fid for r in
                 range_join(facts, dim, "v", bucket_width=10.0).collect())
    assert got == [1, 2]


def test_range_join_ieee_boundary_value_not_dropped(spark):
    """A fact value just below hi can have floor(v/w) round UP into
    bucket floor(hi/w) under IEEE arithmetic even though v < hi holds
    (here v/w rounds to exactly 9299.0), so the expansion must include
    that bucket — the exact predicate re-check removes v == hi."""
    import math
    w, k = 0.2, 9299
    hi = k * w                       # 1859.8000000000002; floor(hi/w)*w == hi
    v = math.nextafter(hi, -math.inf)  # 1859.8 < hi, floor(v/w) == 9299
    assert v < hi and math.floor(v / w) == math.floor(hi / w)
    dim = spark.createDataFrame([(0, 0.0, hi)],
                                "band long, lo double, hi double")
    facts = spark.createDataFrame([(0, v), (1, hi)], "fid long, v double")
    got = sorted(r.fid for r in
                 range_join(facts, dim, "v", bucket_width=w).collect())
    assert got == [0]


def test_range_join_plans_hash_join_not_bnlj(spark):
    facts = spark.range(200).select(F.col("id").cast("double").alias("v"))
    out = range_join(facts, _bands(spark), "v", bucket_width=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan
    assert any(j in plan for j in ("BroadcastHashJoin", "ShuffledHashJoin",
                                   "SortMergeJoin"))


def test_range_join_semi_and_validation(spark):
    facts = spark.createDataFrame([(0, 5.0), (1, 100.0)],
                                  "fid long, v double")
    kept = range_join(facts, _bands(spark), "v", bucket_width=10.0,
                      how="left_semi")
    assert sorted(r.fid for r in kept.collect()) == [0]
    assert kept.columns == ["fid", "v"]
    with pytest.raises(ValueError, match="unsupported"):
        range_join(facts, _bands(spark), "v", how="left")
    empty = spark.createDataFrame([], "band long, lo double, hi double")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(facts, empty, "v")


def test_range_join_property_matches_python_model(spark):
    """Randomized intervals (overlapping, adjacent, empty, negative)
    against a brute-force model, across bucket widths."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.tuples(st.integers(-30, 30), st.integers(0, 20)),
                    min_size=1, max_size=8),
           st.lists(st.integers(-40, 60), min_size=1, max_size=30),
           st.sampled_from([1.0, 3.0, 7.5, 25.0]))
    def check(intervals, values, w):
        dim = spark.createDataFrame(
            [(i, float(lo), float(lo + width))
             for i, (lo, width) in enumerate(intervals)],
            "band long, lo double, hi double")
        fact = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(values)],
            "fid long, v double")
        try:
            got = {(r.fid, r.band) for r in
                   range_join(fact, dim, "v", bucket_width=w).collect()}
        except ValueError:
            # all intervals empty -> bucket_width inference impossible;
            # explicit w given, so only reachable when dim is empty
            raise
        exp = {(fi, bi) for fi, v in enumerate(values)
               for bi, (lo, width) in enumerate(intervals)
               if lo <= v < lo + width}
        assert got == exp

    check()
