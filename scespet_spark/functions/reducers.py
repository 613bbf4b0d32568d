"""Built-in reducers (reference: src/scespet/util/ReduceFuncs.scala) and
the custom-aggregation escape hatch.

Native mappings (Sum :12-18 -> F.sum, Avg :20-30 -> F.avg, Counter
:58-63 -> F.count, Collect :49-52 -> F.collect_list/collect_set) need no
code; this module provides the genuinely custom ones:

* ``ewma`` (ReduceFuncs.scala:33-38) — order-dependent recursive fold;
  no closed-form Spark expression is numerically safe at scale, so it
  runs as an Arrow-batched ``applyInPandas`` per key: the inherently
  sequential recurrence is confined to each key's partition while keys
  execute in parallel (same distribution story as the reference's
  per-key cells, at executor scale).
* ``fold_events`` — generic per-key ordered fold for arbitrary custom
  state (the reference's mutable ``Agg``/``Bucket`` classes,
  types.scala:158-202), batch equivalent of transformWithStateInPandas.
* ``vwap``/``deterministic_mode`` — composite reducers used by the
  reference tests (TradeAnalysis.scala:49-56, RealTradeTests.scala:263-284).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from ..core.stream import Stream


def release_cached() -> int:
    """Unpersist the shuffle+sort table cached by the bucketed ``ewma``
    path; call once its output is materialized."""
    from ..operators._cache import release
    return release("reducers")


def ewma(stream: Stream, value_col: str, alpha: float, out: str = "ewma",
         buckets: Column | None = None) -> Stream:
    """Per-key exponentially weighted moving average, one output per event.

    y_0 = x_0; y_i = alpha*x_i + (1-alpha)*y_{i-1} (reference seeds from
    the first value, ReduceFuncs.scala:33-38).

    For an UNKEYED stream pass ``buckets`` (a NON-NULL coarse
    time-bucket Column, monotone in (t, seq) — same contract as
    ``scan(buckets=...)``; a null bucket has no position in the carry
    chain) to
    replace the single-partition global fold with a two-phase
    decomposition: phase 1 folds each bucket independently (0-seeded),
    emitting only its (event count, end value); the per-bucket carry-in
    values are then composed driver-side via ``c_k = z_k +
    (1-alpha)^{n_k} * c_{k-1}`` (bucket-count-sized collect — the
    driver-held-model pattern); phase 2 re-folds each bucket seeded with
    its exact carry-in, running the identical elementwise recurrence.
    Parallel across buckets, no ``repartition(1)``.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    t, seq, keys = stream.t, stream.seq, list(stream.keys)
    df = stream.df
    # copy, don't .add(): DataFrame.schema is cached and .add mutates it
    schema = StructType(list(df.schema.fields) + [StructField(out, DoubleType())])
    order = [t, seq]

    # pandas ewm(adjust=False) evaluates the identical recurrence
    # ((1-a)*prev + a*x, seeded from x_0) in vectorized cython — same
    # IEEE ops as the reference fold, no per-row Python loop.
    #
    # Memory is bounded by ONE Arrow batch, not the partition: the fold
    # streams the sorted batches and carries each key's last value
    # across batch boundaries (one float per key).  Seeding the next
    # batch's ewm with the carried value reproduces the exact elementwise
    # op sequence of a single unbroken series, so a whale key spanning
    # many batches — or a 100 TB partition — computes bit-identical
    # values without ever materializing the key's history in pandas.
    import numpy as np

    def _chunked_fold(batches, group_keys, init_carry=None):
        # ignore_na=True makes the fold the exact skip-null recurrence:
        # a null value is "no event" (emits the previous mean, consumes
        # no decay step) — matching the reference's double-typed fold,
        # where nulls cannot occur, and keeping the bucketed carry
        # composition (pure linear recurrence) exact under nulls.  The
        # carry is only updated from non-NaN end values so an all-null
        # chunk can't poison later chunks.
        carry: dict = dict(init_carry or {})

        def _norm(kt):
            # null group keys fold as their OWN group (dropna=False
            # below — the same grouping a window partitionBy gives
            # them); normalize NaN/None to one sentinel so the carry
            # dict finds the group across batches (NaN != NaN)
            return tuple("\0null" if v is None
                         or (isinstance(v, float) and np.isnan(v)) else v
                         for v in kt)

        for pdf in batches:
            if not len(pdf):
                continue
            # full(nan), never empty(): a grouping that skipped rows
            # would otherwise emit uninitialized memory for them
            vals = np.full(len(pdf), np.nan, dtype=np.float64)
            groups = (pdf.groupby(group_keys, sort=False,
                                  dropna=False).indices.items()
                      if group_keys else [((), np.arange(len(pdf)))])
            for kt, idx in groups:
                kt = _norm(kt if isinstance(kt, tuple) else (kt,))
                x = pdf[value_col].to_numpy()[idx].astype(np.float64)
                if kt in carry:
                    seeded = np.concatenate(([carry[kt]], x))
                    r = (pd.Series(seeded)
                         .ewm(alpha=alpha, adjust=False, ignore_na=True)
                         .mean().to_numpy()[1:])
                else:
                    r = (pd.Series(x)
                         .ewm(alpha=alpha, adjust=False, ignore_na=True)
                         .mean().to_numpy())
                if not np.isnan(r[-1]):
                    carry[kt] = r[-1]
                vals[idx] = r
            pdf = pdf.copy()
            pdf[out] = vals
            yield pdf

    if keys:
        if buckets is not None:
            raise ValueError("ewma buckets= is the unkeyed two-phase "
                             "path; keyed streams already parallelize "
                             "across keys")
        # secondary-sort pattern: repartition by key to full parallelism
        # (groupBy.applyInPandas would pay a per-group Python dispatch and
        # AQE coalesces its small shuffle to a few tasks), sort JVM-side,
        # then the chunked grouped-ewm over the partition's batch stream.
        n = df.sparkSession.sparkContext.defaultParallelism
        part = df.repartition(n, *keys).sortWithinPartitions(*keys, *order)
        folded = part.mapInPandas(
            lambda batches: _chunked_fold(batches, keys), schema)
    elif buckets is not None:
        # two-phase global fold (see docstring): buckets fold in
        # parallel; only the B carry compositions are sequential.
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)
        df2 = df.withColumn("__b", buckets)
        n = df.sparkSession.sparkContext.defaultParallelism
        part = df2.repartition(n, "__b").sortWithinPartitions("__b", *order)
        # the wide shuffle+sort feeds BOTH phases: without the persist,
        # phase 2 re-executes the identical exchange from scratch,
        # doubling the dominant cost.  Released via release_cached().
        from ..operators._cache import persist as _persist
        part = _persist(part, "reducers")
        btype = df2.schema["__b"].dataType

        def _phase1(batches):
            # per bucket: NON-NULL event count, 0-seeded fold end value,
            # and the bucket's first non-null value, carried across Arrow
            # chunks (buckets are contiguous in the sorted partition, but
            # a chunk boundary can split one).  Nulls consume no decay
            # step (skip-null recurrence, see _chunked_fold) so only
            # non-null counts enter the (1-a)^n carry composition; the
            # first values let the driver derive the global seed x1
            # without a separate scan of the data.
            state: dict = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                for bk, idx in pdf.groupby("__b", sort=False).indices.items():
                    x = pdf[value_col].to_numpy()[idx].astype(np.float64)
                    valid = x[~np.isnan(x)]
                    n0, z0, f0 = state.get(bk, (0, 0.0, None))
                    if len(valid):
                        r = (pd.Series(np.concatenate(([z0], x)))
                             .ewm(alpha=alpha, adjust=False, ignore_na=True)
                             .mean().to_numpy())
                        z0 = float(r[-1])
                        if f0 is None:
                            f0 = float(valid[0])
                    state[bk] = (n0 + len(valid), z0, f0)
            if state:  # empty partitions must not emit (a frame with no
                # rows would carry default float dtypes Arrow can't cast
                # to e.g. a timestamp bucket column)
                yield pd.DataFrame(
                    {"__b": pd.Series(list(state), dtype=object),
                     "__n": [v[0] for v in state.values()],
                     "__z": [v[1] for v in state.values()],
                     "__f": [v[2] for v in state.values()]})

        p1_schema = StructType([StructField("__b", btype),
                                StructField("__n", LongType()),
                                StructField("__z", DoubleType()),
                                StructField("__f", DoubleType())])
        pairs = part.mapInPandas(_phase1, p1_schema).collect()  # B rows
        pairs = sorted(pairs, key=lambda r: r["__b"])
        first_real = next((r for r in pairs if r["__n"] > 0), None)
        if first_real is None:  # no non-null value anywhere
            return stream._derive(
                df.withColumn(out, F.lit(None).cast("double")))
        x1 = float(first_real["__f"])
        cin: dict = {}
        c = None
        for r in pairs:
            bk, nk, zk = r["__b"], r["__n"], r["__z"]
            if c is None:
                # leading buckets before the first value pass the null
                # state through; the first real bucket's end value
                # composes as z + (1-a)^n * x1 (unseeded: y_1 = x_1)
                if nk == 0:
                    continue
                c = zk + (1.0 - alpha) ** nk * x1
            else:
                cin[(bk,)] = c
                c = zk + (1.0 - alpha) ** nk * c
        schema2 = StructType(list(df2.schema.fields)
                             + [StructField(out, DoubleType())])
        folded = part.mapInPandas(
            lambda batches: _chunked_fold(batches, ["__b"], cin), schema2)
        folded = folded.drop("__b")
    else:
        # global EWMA is inherently one ordered series; a single sorted
        # partition streamed batch-by-batch (constant pandas memory)
        part = df.repartition(1).sortWithinPartitions(*order)
        folded = part.mapInPandas(
            lambda batches: _chunked_fold(batches, []), schema)
    return stream._derive(folded)


def fold_events(stream: Stream, fold: Callable[[pd.DataFrame], pd.DataFrame],
                output_schema) -> Stream:
    """Arbitrary stateful per-key fold in replay order — the batch
    equivalent of the reference's bindTo/collapseWith mutable buckets
    (MacroTerm.scala:273-281, VectTerm.scala:632-661).  ``fold`` receives
    one key's events sorted by (t, seq) and returns output rows."""
    t, seq, keys = stream.t, stream.seq, list(stream.keys)
    order = [t, seq]

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        return fold(pdf.sort_values(order, kind="mergesort"))

    if not keys:
        df = stream.df.withColumn("__g", F.lit(0))
        out = df.groupBy("__g").applyInPandas(
            lambda p: _run(p.drop(columns="__g")), schema=output_schema)
    else:
        out = stream.df.groupBy(*keys).applyInPandas(_run, schema=output_schema)
    return stream._derive(out)


def vwap(price_col: str, qty_col: str, scale: str = "18,4") -> Column:
    """Volume-weighted average price (reference test:
    TradeAnalysis.scala:49-56).  Decimal sums keep the value exact and
    order-independent; the final divide is IEEE-deterministic."""
    num = F.sum((F.col(price_col).cast(f"decimal({scale})")
                 * F.col(qty_col).cast(f"decimal({scale})"))).cast("double")
    den = F.sum(F.col(qty_col).cast(f"decimal({scale})")).cast("double")
    return num / den


def deterministic_mode(df: DataFrame, keys: list[str], value_col: str,
                       out: str = "mode") -> DataFrame:
    """Most frequent value with a total tie-break (count desc, value asc)
    — the reference's mode-of-spread (RealTradeTests.scala:263-284) made
    engine-portable (native mode() tie-breaks are nondeterministic)."""
    counts = df.groupBy(*keys, value_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy(*keys).orderBy(F.col("__n").desc(), F.col(value_col).asc())
    return (counts.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(*keys, F.col(value_col).alias(out)))
