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
