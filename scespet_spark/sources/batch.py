"""Batch sources over the driver's parquet tables.

The reference's sources are replayable time-cursored iterators
(EventSource.java:16-60, IteratorEvents SimpleEvaluator.scala:33-62);
the batch translation is a parquet scan consumed in ``(t, seq)`` order.

``load_table`` also normalizes TIMESTAMP(NANOS) parquet columns: Spark
has no nanosecond timestamp type, so with
``spark.sql.legacy.parquet.nanosAsLong`` those columns arrive as long
epoch-nanos; we truncate to microseconds with *integer* division
(values > 2**53 forbid float division), matching DuckDB's ns->us
truncation so DataFrame results hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

from ..core.stream import Stream

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

#: columns that are TIMESTAMP(NANOS) in the driver's parquet files
_NANOS_TS_COLS = {"events": ("ts",)}


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make the driver's parquet timestamps readable on ANY session, not
    just ones built by engine.get_spark — both confs are runtime-settable
    SQL confs, so set them here rather than requiring callers to
    configure their builder.

    - ``nanosAsLong``: TIMESTAMP(NANOS) columns arrive as long
      epoch-nanos instead of dying with PARQUET_TYPE_ILLEGAL.
    - ``inferTimestampNTZ.enabled=false``: timestamp[us] columns written
      without isAdjustedToUTC read as TIMESTAMP (LTZ, UTC session)
      rather than TIMESTAMP_NTZ — NTZ breaks ``unix_micros`` and cannot
      mix with the LTZ timestamps our Timer/spine sources generate.
      Values are identical either way under the UTC session timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def events_stream(spark: SparkSession, sf_dir: str) -> Stream:
    """The `events` table as an event stream: ``ts`` is event-time and
    ``event_id`` the replay-order tie-breaker (it is assigned in
    generation order, mirroring the reference's cycle counter)."""
    return Stream(load_table(spark, sf_dir, "events"), t="ts", seq="event_id")


def _synth_seq(df: DataFrame, seq: str) -> DataFrame:
    """Deterministic replay tie-breaker for sources with no natural
    sequence column: a 64-bit hash of the full row content.  Unlike
    monotonically_increasing_id — whose values follow the partition
    layout, so the same file read with different split settings replays
    same-timestamp events in a different order — the row hash is a pure
    function of the data.  Identical duplicate rows share a seq and so
    coalesce atomically (the (key, t)-cycle semantics), which is the
    deterministic behavior."""
    from pyspark.sql.types import MapType
    # map columns are not hashable by Spark's hash expressions — exclude
    # them rather than fail analysis for any schema containing one
    cols = [F.col(f.name) for f in df.schema.fields
            if not isinstance(f.dataType, MapType)]
    return df.withColumn(
        seq, F.xxhash64(*cols) if cols else F.lit(0).cast("bigint"))


def _fetch_url(path: str) -> str:
    """http(s) sources download once to a content-addressed driver-side
    cache and are read as local files — the reference's URL use case
    (RealTradeTests.scala:53-94) is small reference dumps, and that is
    what this is for: bulk data belongs on distributed storage, where
    the executors read it directly."""
    if not path.startswith(("http://", "https://")):
        return path
    import hashlib
    import os
    import tempfile
    import urllib.request
    dst = os.path.join(tempfile.gettempdir(), "scespet_url_cache",
                       hashlib.md5(path.encode()).hexdigest()
                       + os.path.basename(path)[-40:])
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if not os.path.exists(dst):
        tmp = dst + ".part"
        urllib.request.urlretrieve(path, tmp)
        os.replace(tmp, dst)  # atomic: a crashed download never half-reads
    return dst


def load_csv(spark: SparkSession, path: str, schema: str, sep: str = "\t",
             t: str = "ts", seq: str | None = None,
             header: bool = False) -> Stream:
    """Delimited file/URL event source (reference: the tab-separated
    trade/quote dumps, RealTradeTests.scala:53-94) — a schema'd CSV scan
    consumed in event-time order.  ``seq=None`` synthesizes a
    deterministic row-content hash as the replay tie-breaker; http(s)
    paths download via the driver-side cache (``_fetch_url``)."""
    df = (spark.read.option("sep", sep).option("header", str(header).lower())
          .schema(schema).csv(_fetch_url(path)))
    if seq is None:
        seq = "seq"
        df = _synth_seq(df, seq)
    return Stream(df, t=t, seq=seq)


def load_jsonl(spark: SparkSession, path: str, schema: str | None = None,
               t: str = "ts", seq: str | None = None) -> Stream:
    """JSON-lines corpus source — the de-facto LLM training-data
    interchange format.  Always pass ``schema`` at scale: schema
    inference scans the data once before the real read, doubling the
    100TB ingest.  ``seq=None`` synthesizes the replay tie-breaker."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(_fetch_url(path))
    if seq is None:
        seq = "seq"
        df = _synth_seq(df, seq)
    return Stream(df, t=t, seq=seq)


def timer_spine(spark: SparkSession, start, end, step: str,
                t: str = "ts") -> Stream:
    """Periodic event source (reference: util/Timer.scala:10-30) as a
    generated timestamp spine: sequence() + explode, no driver loop."""
    df = (spark.range(1)
          .select(F.explode(F.sequence(
              F.lit(start).cast("timestamp"),
              F.lit(end).cast("timestamp"),
              F.expr(f"INTERVAL {step}"))).alias(t))
          .withColumn("seq", F.monotonically_increasing_id()))
    return Stream(df, t=t, seq="seq")


def as_vector(spark: SparkSession, keys, key_col: str = "key",
              t: str = "ts", seq: str = "seq") -> Stream:
    """Literal keyset -> keyed stream whose values are the keys
    (reference: asVector, EnvTermBuilder.scala:59-62).  All cells
    initialise at t=0."""
    rows = [(k, 0, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, f"{key_col} string, __t long, {seq} long") \
        if all(isinstance(k, str) for k in keys) else \
        spark.createDataFrame(rows, f"{key_col} long, __t long, {seq} long")
    df = df.select(F.col("__t").cast("timestamp").alias(t), seq, key_col)
    return Stream(df, t=t, seq=seq, keys=(key_col,))


def random_events(spark: SparkSession, n: int, seed: int = 42,
                  t: str = "ts", value: str = "value") -> Stream:
    """Programmatic/random event source (reference: EventGenerator /
    newRandom, test/programs/package.scala:16-52): ``spark.range`` +
    column exprs — generated distributed, never a driver loop.

    Values derive from ``hash(id, seed)``, NOT ``F.rand(seed)``:
    rand() seeds per-PARTITION, so its output changes with the range's
    partition layout — the same call would generate different "random"
    data on a different core count.  The hash form is a pure function
    of (id, seed): reproducible on any cluster shape."""
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000))
         / F.lit(1_000_000.0))
    df = (spark.range(n)
          .select(F.timestamp_micros((F.col("id") * 1_000_000).cast("long")).alias(t),
                  F.col("id").alias("seq"),
                  F.round(u * 100, 6).alias(value)))
    return Stream(df, t=t, seq="seq")


def show(stream: Stream, n: int = 20, prefix: str = "") -> None:
    """Console sink (reference: out(prefix) / util.TermPrint,
    src/scespet/util/package.scala:44-56): print events in replay order."""
    if prefix:
        print(prefix)
    stream.df.orderBy(*stream._order()).show(n, truncate=False)


def write_partitioned(df: DataFrame, path: str, partition_cols=(),
                      sort_within=(), max_records_per_file: int = 2_000_000,
                      mode: str = "overwrite") -> None:
    """Parquet sink for pipeline outputs at scale: hive-partition by the
    given columns, cluster writes so each task writes few files per
    partition value (repartition on the partition key avoids the
    every-task-writes-every-partition small-file explosion), sort within
    files for row-group pruning on later scans, and cap records per
    file so downstream readers get balanced splits."""
    w = df
    if partition_cols:
        w = w.repartition(*[F.col(c) for c in partition_cols])
    if sort_within:
        w = w.sortWithinPartitions(*[F.col(c) for c in
                                     (*partition_cols, *sort_within)])
    writer = (w.write.mode(mode)
              .option("maxRecordsPerFile", str(max_records_per_file)))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
