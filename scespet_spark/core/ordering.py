"""Event-ordering convention.

The reference engine replays events one at a time from a time-ordered
priority queue (reference: src/scespet/core/SimpleEnv.scala:33-38,80-92);
each source event is one atomic graph cycle.  The batch translation of
that contract is a total order ``(t, seq)`` where ``t`` is the event
timestamp and ``seq`` is a monotonically increasing long that breaks
timestamp ties in replay (= cycle) order.

Every operator in this package preserves these two columns, and every
running / windowed computation orders by them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: default column names
T = "ts"
SEQ = "seq"


def order_cols(t: str, seq: str) -> list[Column]:
    return [F.col(t).asc(), F.col(seq).asc()]
