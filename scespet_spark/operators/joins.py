"""Join strategies for skewed and co-located data at cluster scale.

Spark's defaults cover the common cases (AQE splits skewed *shuffle*
partitions; small dims broadcast), but two shapes need explicit help:

* ``salted_join`` — a hot join key whose matching dim rows can't
  broadcast: replicate the dim ``salt`` ways and scatter each fact row
  to one deterministic salt bucket, so the hot key's event mass spreads
  over ``salt`` reducers instead of serializing on one.
* ``write_bucketed`` / bucketed tables — two big tables repeatedly
  joined on the same key: pre-bucket both sides so the join is
  co-located (NO exchange at read time — the property a plan test
  pins).  At 100 TB this converts every recurring join from a full
  shuffle into a local zip of matching buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: Sequence[str],
                salt: int = 8, fact_row_cols: Sequence[str] | None = None,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join of a big ``fact`` side against a
    non-broadcastable ``dim`` side.

    The dim side is replicated ``salt`` times (explode — one narrow
    stage, dim is the smaller side by assumption); each fact row picks
    ONE salt deterministically from ``fact_row_cols`` (default: all
    fact columns), so the join key becomes (on..., salt) and a key with
    10^9 fact rows spreads over ``salt`` reducers.  Deterministic — no
    ``rand()`` — so retries/speculative tasks agree.

    Use when AQE skew-split can't apply: the skew is on the *map* side
    of a required aggregation, or the dim rows for the hot key are too
    wide to replicate via broadcast.

    Only fact-preserving joins are supported: with ``right``/``full``
    ``how``, each unmatched dim *replica* would survive as its own
    null-extended row, inflating the dim side up to ``salt``-fold."""
    if not 1 <= salt <= 1 << 16:
        raise ValueError("salt must be in [1, 65536]")
    safe = {"inner", "left", "leftouter", "left_outer",
            "left_semi", "leftsemi", "semi",
            "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join how={how!r} unsupported: dim-side replication "
            f"makes right/full outer joins emit up to salt x unmatched "
            f"dim rows; use one of {sorted(safe)}")
    if "__salt" in (*fact.columns, *dim.columns):
        raise ValueError("input already has a '__salt' column — rename "
                         "it (the join would silently clobber it)")
    row_cols = list(fact_row_cols) if fact_row_cols else list(fact.columns)
    sdim = (dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .withColumn("__salt", F.col("__salt").cast("int")))
    sfact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in row_cols]),
                         F.lit(salt)).cast("int"))
    return (sfact.join(sdim, [*on, "__salt"], how)
            .drop("__salt"))


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int = 32, sort_cols: Sequence[str] = (),
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (and optionally sorted) table so later
    equi-joins and aggregations on ``bucket_cols`` are co-located: both
    sides read matching buckets and the join plans with NO Exchange.
    Sorting within buckets additionally removes the join's Sort.

    Bucketing requires the table catalog (``saveAsTable``) — plain
    ``.parquet(path)`` cannot record bucket metadata."""
    spark = df.sparkSession
    if mode == "overwrite":
        # with an in-memory catalog, a previous session's managed-table
        # directory outlives its catalog entry; overwrite must reclaim
        # the orphaned location or saveAsTable raises
        # LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if "." not in table:
            jvm = spark.sparkContext._jvm
            wh = spark.conf.get("spark.sql.warehouse.dir")
            p = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
            fs = p.getFileSystem(
                spark.sparkContext._jsc.hadoopConfiguration())
            if fs.exists(p):
                fs.delete(p, True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def range_join(fact: DataFrame, dim: DataFrame, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               bucket_width: float | None = None,
               how: str = "inner") -> DataFrame:
    """Interval/band join at fact scale: match each fact row to every
    dim interval with ``lo <= value < hi`` — WITHOUT the
    nested-loop plan Spark gives a raw BETWEEN join.

    Open-source Spark plans a non-equi join as
    BroadcastNestedLoopJoin (every fact row tests every interval:
    O(|fact|·|dim|) comparisons — 10^11 rows × 10^4 bands is 10^15
    comparison ops) or, worse, a cartesian product.  The classic fix
    is BUCKET EXPANSION: pick a ``bucket_width`` w, explode each dim
    interval to one row per w-aligned bucket it overlaps, give each
    fact row its single bucket ``floor(value/w)``, and equi-join on
    the bucket before re-checking the exact predicate.  The plan
    becomes a plain (broadcast- or shuffle-) HASH join: each fact row
    is compared only against intervals overlapping ITS bucket.

    A (fact, dim) pair matches in exactly one bucket — the fact's own
    — so no dedup is needed.  Expansion factor is
    ``avg_interval_width / w`` (choose w near the typical interval
    width: expansion stays O(1)-few rows per interval and each bucket
    sees only local intervals).  ``bucket_width`` defaults to the
    dims' average interval width (one tiny aggregate over the dim
    side).  Overlapping intervals are fine (a fact row emits one row
    per matching interval); ``how='left_semi'`` gives the band-filter
    form without emitting dim columns."""
    if how.lower() not in {"inner", "left_semi", "leftsemi", "semi"}:
        raise ValueError(
            f"range_join how={how!r} unsupported: bucket expansion "
            f"replicates dim intervals, so outer joins would emit "
            f"expanded unmatched rows; use inner or left_semi")
    v = F.col(value_col).cast("double")
    lo = F.col(lo_col).cast("double")
    hi = F.col(hi_col).cast("double")
    if bucket_width is None:
        got = dim.agg(F.avg(hi - lo).alias("w")).collect()[0]["w"]
        if got is None or got <= 0:
            raise ValueError(
                f"cannot infer bucket_width from {lo_col}/{hi_col} "
                f"(empty dim or non-positive average width) — pass "
                f"bucket_width= explicitly")
        bucket_width = float(got)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    w = F.lit(float(bucket_width))
    # one row per w-aligned bucket the interval [lo, hi) overlaps;
    # empty intervals (hi <= lo) cover no bucket and drop out here.
    # hi is EXCLUSIVE, but we still expand THROUGH bucket floor(hi/w):
    # under IEEE rounding a fact value just below hi can have
    # floor(v/w) land in that final bucket even though v < hi holds,
    # so trimming it (hi == floor(hi/w)*w → last bucket - 1) can
    # silently drop a true match.  The exact predicate re-check below
    # removes the extra bucket's false positives, so the cost is at
    # most one expanded row per boundary-aligned interval.
    if "__b" in (*fact.columns, *dim.columns):
        raise ValueError("input already has a '__b' column — rename it "
                         "(the join would silently clobber it)")
    # refuse pathological expansion instead of dying deep in the
    # executor: one outlier interval 10^6 buckets wide (w tuned to the
    # TYPICAL band) would explode into a Spark max-array-length error
    # or an OOM with no hint that bucket_width is the knob
    n_buckets = F.floor(hi / w).cast("long") - F.floor(lo / w).cast("long")
    guard = F.when(
        n_buckets <= F.lit(1_000_000), F.lit(True)).otherwise(
        F.raise_error(F.concat(
            F.lit(f"range_join: interval [{lo_col}, {hi_col}) spans "),
            n_buckets.cast("string"),
            F.lit(f" buckets at bucket_width={bucket_width!r} — raise "
                  f"bucket_width or split outlier intervals"))))
    xdim = (dim.filter(hi > lo).filter(guard)
            .withColumn("__b", F.explode(F.sequence(
                F.floor(lo / w).cast("long"),
                F.floor(hi / w).cast("long")))))
    xfact = fact.withColumn("__b", F.floor(v / w).cast("long"))
    cond = ((xfact["__b"] == xdim["__b"])
            & (v >= lo) & (v < hi))
    if how.lower() in {"left_semi", "leftsemi", "semi"}:
        return xfact.join(xdim, cond, "left_semi").drop("__b")
    return (xfact.join(xdim, cond, "inner")
            .drop(xfact["__b"]).drop(xdim["__b"]))
