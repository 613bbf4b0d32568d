"""scespet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dan-van/scespet, re-expressed Spark-first.

The reference is a single-threaded push-graph CEP library; this package
declares the same semantics as lazy DataFrame plans and lets Catalyst +
Tungsten execute them (batch over time-ordered tables = the reference's
deterministic replay; Structured Streaming for live mode)."""

from .core.stream import (  # noqa: F401
    AFTER,
    BEFORE,
    Count,
    Every,
    GroupedStream,
    Session,
    Sliding,
    Stream,
    Termination,
    Trigger,
    TriggerStream,
    WindowedStream,
)
from .engine import get_spark  # noqa: F401

__all__ = [
    "AFTER",
    "BEFORE",
    "Count",
    "Every",
    "GroupedStream",
    "Session",
    "Sliding",
    "Stream",
    "Termination",
    "Trigger",
    "TriggerStream",
    "WindowedStream",
    "get_spark",
]
