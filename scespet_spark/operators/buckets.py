"""Multi-input buckets: N streams bound into one aggregation state with
open/complete lifecycle and atomic same-cycle rendezvous.

Reference semantics (NOT copied — re-expressed set-oriented):
  * ``bindTo``/``bind`` attach N typed input streams to one mutable
    bucket (MacroTerm.scala:273-281,371-374; VectTerm.scala:501-517,
    581-585).
  * Simultaneous events are atomic — a multi-input node fires once per
    graph cycle after all inputs (JoinValueRendezvous,
    SlicedBucket.scala:33-83; SlowGraphWalk.java:82-93).
  * Buckets are re-opened per slice with open()/complete() lifecycle
    (SliceCellLifecycle.scala:13-30).

Spark translation:
  * ``bind`` = tagged union: each input keeps its own value columns,
    other sides' columns are null.  One shuffle-free union; downstream
    grouping shuffles once on (key, bucket).
  * rendezvous = group by (key, cycle_time) *before* aggregating —
    "fires once per cycle after all inputs" becomes one row/group per
    cycle.
  * lifecycle buckets = ``applyInPandas`` over (key, bucket): Arrow
    batches, one Python object per bucket, cycles replayed in (t, seq)
    order.  Each bucket's rows are one group — at 100TB the parallelism
    is the number of (key, bucket) groups, which is exactly the
    reference's own state granularity; standard aggs should use the
    pure-columnar path instead (GroupedStream.reduce).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..core.stream import GroupedStream, Stream


def bind(inputs: dict[str, tuple[Stream, Sequence[str]]]) -> Stream:
    """Tagged union of N input streams: output has every side's value
    columns (null when that side didn't fire) plus a ``side`` tag.
    All inputs must share key/t/seq column names (they come from the
    same keyed universe, as in the reference's per-key binds)."""
    first = next(iter(inputs.values()))[0]
    parts = []
    for tag, (s, cols) in inputs.items():
        keep = [*s.keys, s.t, s.seq, *cols]
        parts.append(s.df.select(*keep).withColumn("side", F.lit(tag)))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return Stream(df, t=first.t, seq=first.seq, keys=tuple(first.keys))


class CycleBucket:
    """Base lifecycle bucket: subclass and override.  ``add_cycle``
    receives ALL rows sharing one cycle time at once (atomic rendezvous,
    like a single calculate() with every input's adder already called)."""

    def open(self) -> None:  # per-slice re-open
        pass

    def add_cycle(self, cycle: pd.DataFrame) -> None:
        raise NotImplementedError

    def value(self) -> dict:
        raise NotImplementedError

    def complete(self) -> None:  # slice close
        pass


def collapse(grouped: GroupedStream, bucket_factory, schema,
             emit: str = "last", cycle_col: str | None = None) -> DataFrame:
    """Run a custom lifecycle bucket over each (key, slice) group
    (reference: collapseWith/collapseK, VectTerm.scala:632-661;
    emission ReduceType.LAST = ``emit='last'``, CUMULATIVE = ``'all'``).

    ``schema`` is the output schema (DDL string or StructType) and must
    contain the stream's key columns, ``t``/``seq``, and every field of
    ``bucket.value()``.  ``cycle_col`` defaults to the event-time column
    (each distinct timestamp is one atomic cycle)."""
    s = grouped._with_bucket()
    from ..core.stream import _BUCKET  # internal bucket-id column

    t, seq, keys = s.t, s.seq, list(s.keys)
    cyc = cycle_col or t

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([t, seq], kind="mergesort")
        bucket = bucket_factory()
        bucket.open()
        out_rows = []
        key_vals = {k: pdf.iloc[0][k] for k in keys}
        for _, cycle in pdf.groupby(cyc, sort=True):
            bucket.add_cycle(cycle)
            if emit == "all":
                out_rows.append({**key_vals, t: cycle[t].iloc[-1],
                                 seq: cycle[seq].iloc[-1], **bucket.value()})
        bucket.complete()
        if emit == "last":
            out_rows.append({**key_vals, t: pdf[t].iloc[-1],
                             seq: pdf[seq].iloc[-1], **bucket.value()})
        return pd.DataFrame(out_rows)

    return (s.df.groupBy(*keys, _BUCKET)
            .applyInPandas(run, schema))
