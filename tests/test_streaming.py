"""Live-mode (Structured Streaming) equivalence: the same semantics the
batch engine verifies against DuckDB must hold when executed as a
streaming plan over the same data (AvailableNow + memory sink)."""

import pytest
from pyspark.sql import functions as F

from scespet_spark.sources.batch import load_table
from scespet_spark.streaming.live import (
    dedupe, read_events_stream, run_available_now, stateful_scan, tumbling,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, SF, "events")


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streaming_tumbling_equals_batch(spark, batch_events):
    live = tumbling(read_events_stream(spark, SF), "1 day",
                    keys=["event_type"],
                    total=F.sum("value"), n=F.count("*"))
    got = run_available_now(live, "complete")
    want = (batch_events
            .groupBy("event_type", F.date_trunc("day", "ts").alias("win_start"))
            .agg(F.sum("value").alias("total"), F.count("*").alias("n")))
    cols = ["event_type", "win_start", "n"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_streaming_dedupe_equals_batch_distinct(spark, batch_events):
    live = dedupe(read_events_stream(spark, SF), ["user_id", "event_type"])
    got = run_available_now(live, "append")
    # dedupe keys include ts (watermark requirement), so the live result
    # is distinct (user, type, ts); project to the value set
    n_got = got.select("user_id", "event_type").distinct().count()
    n_want = batch_events.select("user_id", "event_type").distinct().count()
    assert n_got == n_want


def test_stateful_scan_running_total(spark, batch_events):
    def step(st, pdf):
        rows = []
        for v in pdf["value"]:
            st["total"] += float(v)
            rows.append({"total": st["total"]})
        return rows

    live = stateful_scan(read_events_stream(spark, SF), ["user_id"],
                         {"total": 0.0}, step,
                         "user_id long, total double")
    got = run_available_now(live, "append")
    # final per-user total must equal the batch sum
    final = got.groupBy("user_id").agg(F.max("total").alias("total"))
    want = batch_events.groupBy("user_id").agg(F.sum("value").alias("total"))
    g = {r.user_id: round(r.total, 6) for r in final.collect()}
    w = {r.user_id: round(r.total, 6) for r in want.collect()}
    assert g == w
