"""Deterministic cross-engine hashing.

All dedup/similarity operators hash with the first 15 hex chars of md5
(60 bits, fits a signed 64-bit int) so the DuckDB oracle can compute the
*identical* value: Spark ``conv(substring(md5(x),1,15),16,10)`` ==
DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``.  Seeded families are
``md5(seed || ':' || x)``.

Scale note: md5 here is a *portability* choice for oracle checking; the
operators take a ``hash_col`` builder so production runs can swap in
``xxhash64`` (cheaper, JVM-native) without touching operator logic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def h64(col: Column, seed: int | None = None) -> Column:
    """60-bit deterministic hash of a string column (optionally seeded)."""
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def h64_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL for the same hash."""
    if seed is not None:
        expr = f"'{seed}:' || {expr}"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def h64hi(col: Column, seed: int | None = None) -> Column:
    """The UPPER 60 bits of the SAME md5 (hex chars 17..31): pairs with
    ``h64`` for a 120-bit combined digest at zero extra hash cost (the
    md5 is shared; Catalyst subexpression elimination computes it
    once).  120 bits keeps the birthday bound astronomically far from
    any corpus — expected colliding pairs ~ n^2 / 2^121 is ~2^-32 even
    at 100 TB (n ~ 2^44.5 gram occurrences).  See ``digest_cols`` in
    dedup.py for the wide-election pattern."""
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(col), 17, 15), 16, 10).cast("bigint")


def h64hi_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL for ``h64hi``."""
    if seed is not None:
        expr = f"'{seed}:' || {expr}"
    return f"('0x' || substr(md5({expr}), 17, 15))::BIGINT"
