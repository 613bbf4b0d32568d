"""Data-layout operators: Z-order (Morton) clustering keys for
multi-column data skipping.

Sorting a table by ONE column gives parquet min/max stats that prune
scans filtered on that column — and nothing else.  Interleaving the
bits of several columns' normalized ranks (the Z-order / Morton curve)
gives a single sort key under which EVERY interleaved column stays
locally clustered: a file (or row group) covers a small hyper-rectangle
of the value space, so a selective filter on any of the columns skips
most files from their min/max footers alone.  This is the standard
lakehouse layout trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``),
re-expressed as plain codegen column arithmetic + a range partition —
no engine extension needed.

Scale shape: one tiny min/max aggregate (broadcast attach), a map-only
key computation (shift/or codegen, no UDF), and ONE range-partition
shuffle that replaces the write's ordinary repartition — the layout
cost is one sort of the data being written, paid once at rest-time to
make every later selective scan cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(df: DataFrame, cols, bits: int = 16,
               out: str = "zkey") -> DataFrame:
    """Attach the Z-order (Morton) key over ``cols``: each column is
    min/max-normalized to a ``bits``-bit integer rank and the ranks'
    bits are interleaved, most significant first.  ``len(cols) * bits``
    must fit in 63 bits.  Null values rank 0 (sort to the low corner).

    Deterministic and engine-exact: the normalization uses explicit
    ``floor(x + 0.5)`` half-up rounding on doubles (every engine agrees)
    and the interleave is pure integer bit arithmetic — the oracle
    reproduces the key bit-for-bit in SQL.  Constant columns (max ==
    min) rank 0 everywhere and simply drop out of the ordering.
    Null and NON-FINITE values rank 0 (sort to the low corner) and are
    EXCLUDED from the min/max stats — without the exclusion a single
    NaN poisons ``max()`` (NaN sorts greatest) and silently zeroes
    every row's key."""
    cols = list(cols)
    total = len(cols) * bits
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in {cols}")
    if bits < 1:
        raise ValueError(
            f"bits={bits}: a <1-bit rank is a constant key — every row "
            f"would land in one range partition")
    if total > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {total} > 63 key bits — "
            f"lower bits (pruning needs only coarse ranks)")
    clashes = [n for c in cols
               for n in (f"__mn_{c}", f"__mx_{c}") if n in df.columns]
    if out in df.columns or clashes:
        raise ValueError(
            f"output/stat column name already exists in the input: "
            f"{[out] if out in df.columns else clashes}")
    inf = F.lit(float("inf"))

    def finite(d: Column) -> Column:
        return d.isNotNull() & ~F.isnan(d) & (F.abs(d) != inf)

    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        fin = F.when(finite(d), d)
        aggs += [F.min(fin).alias(f"__mn_{c}"), F.max(fin).alias(f"__mx_{c}")]
    j = df.crossJoin(F.broadcast(df.agg(*aggs)))
    top = (1 << bits) - 1
    ranks: list[Column] = []
    for c in cols:
        v = F.col(c).cast("double")
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        r = F.when(
            finite(v) & (mx > mn),
            F.floor((v - mn) / (mx - mn) * F.lit(float(top)) + F.lit(0.5)))
        ranks.append(F.coalesce(r, F.lit(0)).cast("long"))
    z: Column = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):          # MSB first
        for r in ranks:                        # column order within a level
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(r, b).bitwiseAND(F.lit(1)))
    return j.select(*df.columns, z.alias(out))


def zorder_layout(df: DataFrame, cols, bits: int = 16,
                  n_files: int | None = None) -> DataFrame:
    """The write-side composition: attach the Z-key, range-partition on
    it (``n_files`` output splits; default: current shuffle
    parallelism), sort within partitions, and drop the key — the
    returned frame writes parquet whose per-file min/max stats prune on
    EVERY interleaved column.  One shuffle, the same one any clustered
    write pays."""
    keyed = zorder_key(df, cols, bits=bits, out="__z")
    parts = ([F.col("__z")] if n_files is None
             else [n_files, F.col("__z")])
    return (keyed.repartitionByRange(*parts)
            .sortWithinPartitions("__z")
            .drop("__z"))
