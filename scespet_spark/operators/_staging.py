"""Corpus-materialization staging points.

Several operators materialize an intermediate once so that multiple
downstream passes (LM fit + apply, EM iterations, CC rounds, standing
Bloom rows) read the staged table instead of re-deriving it.  The
default primitive is ``localCheckpoint``: fastest (executor-local
blocks, no durable write), but NOT recomputable — on a real cluster an
executor loss or dynamic-allocation scale-in kills the job with a
missing-block error instead of recomputing (guide §5).

``SPARK_GRAFT_RELIABLE_CHECKPOINT=<dir>`` switches every staging point
to a RELIABLE checkpoint written under ``<dir>`` (HDFS/object-store in
production): blocks survive executor loss, at the cost of one durable
write per staging point.  The local default is unchanged — bench and
tests keep localCheckpoint — and the rows a stage returns are
identical either way (checkpointing only changes WHERE the
materialized blocks live).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_RELIABLE_CHECKPOINT"


def stage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` as a staging point: ``localCheckpoint`` by
    default, a reliable ``checkpoint`` under ``$SPARK_GRAFT_RELIABLE_
    CHECKPOINT`` when that is set (the cluster-reliability profile)."""
    ckdir = os.environ.get(_ENV)
    if ckdir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
