"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
setting here is chosen to also make sense on a large cluster:

- AQE on (runtime re-planning, skew-join handling, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized to 2x cores locally; on a real
  cluster you would size to 2-3x total executor cores or rely on AQE
  coalescing from a high initial number.
- Arrow enabled so the pandas-UDF paths (custom reducers, multimodal
  decode) use vectorized Arrow batches instead of per-row pickling.
- UTC session timezone so event-time arithmetic is stable across hosts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scespet-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
) -> SparkSession:
    """``rocksdb_state=True`` switches Structured Streaming state to the
    RocksDB provider — the production setting for the stateful live
    operators (keymap cell tables, sliding-scan windows, dedup digest
    sets): state spills to local disk with changelog checkpointing
    instead of living on the executor heap, so state size is bounded by
    disk, not memory.  Off by default locally (HDFS-backed in-memory
    store is faster at test scale)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(32, 2 * cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE post-shuffle coalescing keeps its parallelism-first
        # default: a bytes-first profile (parallelismFirst=false +
        # advisory sizing — guide §2.2's "fewer, larger reduce
        # partitions") was MEASURED this round and regressed the bench
        # 1.2-4x across the board — at these per-partition byte counts
        # the stages are CPU-bound (windows over fan-outs, codegen
        # aggregates), so coalescing every Exchange to ~1 task
        # serializes the actual work.  The env knobs remain so a
        # cluster profile (where partitions should be 100MB-1GB and
        # scheduling overhead dominates) can flip them without a code
        # change; defaults reproduce stock Spark behavior.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST",
                               "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "64m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # join-strategy preference stays sort-merge (stock default):
        # preferSortMergeJoin=false (guide §3.1's shuffled-hash
        # preference) rode along in the regressed config above; it is
        # kept as an env knob for cluster profiles rather than a local
        # default until measured alone.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark has no TIMESTAMP(NANOS) type; read ns columns as long and
        # normalize in sources.batch.load_table (truncate to micros, same
        # as DuckDB's ns->us behavior, keeping oracle parity).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp[us] without isAdjustedToUTC should read as LTZ (UTC
        # session) not NTZ, so parquet event-times mix with generated
        # timestamp spines and support unix_micros arithmetic.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # bucketed-table home (operators.joins.write_bucketed); kept out
        # of the repo tree — point at durable storage in production
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/scespet_spark_warehouse"))
    )
    if rocksdb_state:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider").config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled", "true")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
