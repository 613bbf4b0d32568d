#!/usr/bin/env python
"""Dump .explain('formatted') for declared queries without executing
them (plan capture for plans/r12/).

Usage: python tools/dump_plans.py OUTDIR SUFFIX q1 q2 ...
Writes OUTDIR/<q><SUFFIX>.txt ('' suffix allowed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from scespet_spark import get_spark  # noqa: E402


def main():
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="scespet-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
