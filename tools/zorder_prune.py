#!/usr/bin/env python
"""Z-order pruning A/B: write the replicated lineitem under (a) a
single-key price sort and (b) ``zorder_layout(price, quantity)``, then
count — directly from the parquet footers' min/max statistics, the
same test any reader's predicate pushdown runs — how many row groups a
filter must visit under each layout.

Run: ``python tools/zorder_prune.py [sf_dir] [mult] [n_files]``
(defaults /root/testdata/sf0.1, 10x, 64 files, 1 MiB row groups).
Results recorded in SCALE.md ("Z-order layout — measured row-group
pruning A/B").
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scespet_spark import get_spark  # noqa: E402
from scespet_spark.operators.layout import zorder_layout  # noqa: E402


def visits(path: str, boxes) -> tuple[int, int, int, int]:
    """(row groups total, visited, rows total, rows visited) for a
    conjunction of [lo, hi] column boxes, judged from footer stats."""
    tot = vis = rows_tot = rows_vis = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            tot += 1
            rows_tot += rg.num_rows
            hit = True
            for col, lo, hi in boxes:
                st = rg.column(idx[col]).statistics
                if st is None:
                    continue  # no stats -> must visit
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            if hit:
                vis += 1
                rows_vis += rg.num_rows
    return tot, vis, rows_tot, rows_vis


def main(sf_dir="/root/testdata/sf0.1", mult="10", n_files="64"):
    mult, n_files = int(mult), int(n_files)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    big = (li.crossJoin(spark.range(mult).select(F.col("id").alias("rep")))
           .drop("rep"))
    print(f"rows: {big.count()}")

    base = os.path.join(tempfile.gettempdir(), "zorder_ab")
    shutil.rmtree(base, ignore_errors=True)
    (big.repartitionByRange(n_files, "l_extendedprice")
     .sortWithinPartitions("l_extendedprice")
     .write.mode("overwrite").option("parquet.block.size", 1 << 20)
     .parquet(f"{base}/bykey"))
    (zorder_layout(big, ["l_extendedprice", "l_quantity"], bits=16,
                   n_files=n_files)
     .write.mode("overwrite").option("parquet.block.size", 1 << 20)
     .parquet(f"{base}/zorder"))

    filters = {
        "price+qty box": [("l_extendedprice", 30000, 33000),
                          ("l_quantity", 10, 15)],
        "qty-only": [("l_quantity", 1, 3)],
        "price-only": [("l_extendedprice", 30000, 33000)],
    }
    for name in ("bykey", "zorder"):
        for label, boxes in filters.items():
            tot, vis, rt, rv = visits(f"{base}/{name}", boxes)
            print(f"{name:6s} {label:13s}: visits {vis}/{tot} row groups "
                  f"({100 * rv / rt:.1f}% of rows)")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
