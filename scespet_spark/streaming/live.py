"""Structured Streaming ("live") mode.

The reference replays a time-ordered event queue through a push graph
(SimpleEnv.scala:59-103); both historic and realtime sources share one
contract (EventSource.java:3-6).  Here the SAME operator semantics run
as Structured Streaming plans: batch mode (core.stream) is the
deterministic replay used for verification, and this module provides
the live counterparts:

  * file/rate sources with event-time columns,
  * tumbling/sliding windowed aggregation with watermarked late-data
    handling (a new capability — the reference has no late-data concept,
    SURVEY §2.6),
  * streaming deduplication (valueSet/toValueSet in live mode),
  * arbitrary per-key incremental state via applyInPandasWithState —
    the streaming equivalent of the reference's mutable Agg/Reducer
    cells (types.scala:158-185).

Scale notes: every construct here is executor-parallel keyed state —
state store partitions follow ``spark.sql.shuffle.partitions``; at
cluster scale use RocksDB state store and watermarks tight enough to
bound state size.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """The driver's ``events`` table as a file-streaming source (the
    live analogue of sources.batch.events_stream).  Schema is taken
    from a batch read; TIMESTAMP(NANOS) columns arrive as long under
    ``nanosAsLong`` and are truncated to micros exactly like batch."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the streaming file source requires a *directory*; the driver ships
    # single parquet files, so stage a symlink dir (no data copy)
    import os
    import tempfile
    if os.path.isfile(path):
        stage = os.path.join(tempfile.gettempdir(),
                             "scespet_stream_src",
                             path.strip("/").replace("/", "_"))
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "part-0.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        path = stage
    df = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(path))
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tumbling(df: DataFrame, duration: str, keys: Iterable[str] = (),
             t: str = "ts", watermark: str = "1 day",
             **aggs: Column) -> DataFrame:
    """Watermarked tumbling-window aggregation: the live form of
    ``group(Every(duration)).reduce(...)``.  Late rows beyond
    ``watermark`` are dropped and state for closed windows is purged —
    bounded state at any scale."""
    wm = df.withWatermark(t, watermark)
    return (wm.groupBy(*keys, F.window(F.col(t), duration).alias("win"))
            .agg(*[a.alias(n) for n, a in aggs.items()])
            .withColumn("win_start", F.col("win.start"))
            .drop("win"))


def dedupe(df: DataFrame, cols: Iterable[str], t: str = "ts",
           watermark: str = "1 day") -> DataFrame:
    """Streaming distinct-by-columns (live ``valueSet``/``toValueSet``,
    reference MacroTerm.scala:160-185): state bounded by the watermark."""
    return df.withWatermark(t, watermark).dropDuplicates([*cols, t])


def stateful_scan(df: DataFrame, keys: list[str], state_fields: dict[str, float],
                  step: Callable, out_schema: str, t: str = "ts") -> DataFrame:
    """Arbitrary per-key incremental state — the live equivalent of the
    reference's mutable Agg cells fed one event at a time.

    ``state_fields`` maps state names to initial values; ``step(state,
    pdf)`` folds a sorted pandas batch into the state dict and returns
    output rows (list of dicts).  Uses applyInPandasWithState so state
    lives in the executor state store, partitioned by key."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import StructType
    import pandas as pd

    state_names = list(state_fields)
    state_schema = StructType.fromDDL(
        ", ".join(f"{n} double" for n in state_names))

    def fn(key, pdfs, state):
        if state.exists:
            st = dict(zip(state_names, state.get))
        else:
            st = dict(state_fields)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(t, kind="mergesort")
            rows.extend(step(st, pdf))
        state.update(tuple(st[n] for n in state_names))
        key_vals = dict(zip(keys, key))
        yield pd.DataFrame([{**key_vals, **r} for r in rows])

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)


def run_available_now(df: DataFrame, output_mode: str = "complete",
                      name: str | None = None) -> DataFrame:
    """Execute a streaming DataFrame over all currently-available input
    (Trigger.AvailableNow) into a memory sink and return the result as
    a batch DataFrame — the bridge that lets the same golden tests
    assert on live-mode output."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return df.sparkSession.table(name)
