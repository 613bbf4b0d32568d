#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given scale factor
and compares it with ``oracle_sql()`` via DuckDB: row count, column
names, and exact cell values after sorting columns by name and rows by
all columns.  Stricter than any reasonable driver hash — if this
passes, the driver's order-insensitive value-hash passes.

Usage: python tools/check_oracle.py [sf_dir] [--json OUT.json] [query ...]
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from scespet_spark import get_spark  # noqa: E402
from scespet_spark.sources.batch import TABLES  # noqa: E402


def _normalize(df):
    """pandas frame -> sorted-by-name columns, canonical python values."""
    df = df[sorted(df.columns)]

    def canon(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return float(v)
        if hasattr(v, "isoformat"):  # datetime-like
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        if type(v).__name__ in ("int64", "int32", "uint64"):
            return int(v)
        if type(v).__name__ in ("float64", "float32"):
            return canon(float(v))
        if type(v).__name__ == "Decimal":
            return float(v)
        if type(v).__name__ == "Timestamp":
            return v.isoformat()
        return v

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(df.columns), sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [sf_dir] [--json OUT.json] "
                  "[query ...]", file=sys.stderr)
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(queries)
    failed = []
    report = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            report[name] = {"status": "spark_error", "err": str(e)[:300]}
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            report[name] = {"status": "rows_only", "rows": len(sdf),
                            "sec": round(time.time() - t0, 1)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            report[name] = {"status": "duckdb_error", "err": str(e)[:300]}
            continue
        scols, srows = _normalize(sdf)
        ocols, orows = _normalize(odf)
        ok = True
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            ok = False
        # the driver hashes raw pandas values, where int64 123 != float64
        # 123.0 even though the canon compare above treats them equal
        # (the round-2 HUGEINT lesson) — so pin numeric dtype KINDS too
        if ok:
            drift = {c: (sdf[c].dtype.kind, odf[c].dtype.kind)
                     for c in scols
                     if {sdf[c].dtype.kind, odf[c].dtype.kind} == {"i", "f"}}
            if drift:
                print(f"FAIL {name}: int-vs-float dtype drift (driver "
                      f"hash would differ): {drift}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            report[name] = {"status": "ok", "rows": len(srows),
                            "sec": round(time.time() - t0, 1)}
        else:
            failed.append(name)
            report[name] = {"status": "mismatch", "rows": len(srows),
                            "oracle_rows": len(orows)}
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(names),
            "n_passed": len(names) - len(failed),
            "failed": failed,
            "queries": report,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
