"""Driver-contract invariants for __spark_entry__: the correctness gate
only evaluates the FIRST 50 entries of queries(), so the priority list
must stay within budget and everything added or changed in the current
round must sit inside the checked window.  Also pins driver-hashability:
the driver canonicalizes results via pandas sort_values, which crashes
on list/map-typed cells, so no query may emit a complex-typed column."""

import os

import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_priority_within_driver_window():
    assert len(entry._PRIORITY) <= 50, "driver checks only the first 50"
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY), "duplicates"
    unknown = set(entry._PRIORITY) - set(entry._QUERIES)
    assert not unknown, f"_PRIORITY names unknown queries: {unknown}"


def test_round_changed_queries_inside_checked_window():
    head = list(entry.queries())[:50]
    missing = [q for q in entry._ROUND_CHANGED if q not in head]
    assert not missing, (
        f"queries changed this round fall outside the driver's 50-query "
        f"window: {missing}")
    unknown = set(entry._ROUND_CHANGED) - set(entry._QUERIES)
    assert not unknown, f"_ROUND_CHANGED names unknown queries: {unknown}"


def test_every_query_has_an_oracle():
    # declared rows-only queries get the driver's weaker rows/schema
    # check; anything else must carry full oracle SQL
    missing = (set(entry.queries()) - set(entry.oracle_sql())
               - entry.ROWS_ONLY)
    assert not missing, f"queries without oracle SQL: {missing}"
    assert entry.ROWS_ONLY <= set(entry.queries())
    assert not (entry.ROWS_ONLY & set(entry.oracle_sql())), \
        "ROWS_ONLY queries must not also register oracle SQL"


def test_no_complex_typed_output_columns(spark, all_query_dfs):
    # live_* queries execute a streaming job on call; their outputs mirror
    # batch counterparts, so the schema pin covers the batch surface.
    # Queries come from the session-shared construction fixture (the
    # plan-audit sweep needs the same ~250 constructions).
    from pyspark.sql.types import ArrayType, MapType
    bad = {}
    for name, df in all_query_dfs.items():
        if name.startswith("live_"):
            continue
        complex_cols = [f.name for f in df.schema.fields
                        if isinstance(f.dataType, (ArrayType, MapType))]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"driver-unhashable (list/map) output columns: {bad}"
