"""localCheckpoint lifecycle: actually releasing superseded frames.

Every iterative fixpoint in this engine (PageRank, connected
components, BFS/SSSP, LPA, coreness, BPE learn, SCD chaining, ...)
truncates lineage per round with ``DataFrame.localCheckpoint(eager)``
and then retires the superseded frame. The retirement step has a trap:
``DataFrame.unpersist()`` only removes CacheManager entries — plans
registered through ``.persist()``/``.cache()``. A localCheckpoint is
backed by a ``LogicalRDD`` whose underlying RDD was persisted directly
on the SparkContext, so calling ``.unpersist()`` on the checkpointed
frame is a SILENT NO-OP: the storage blocks stay registered for the
lifetime of the session, one per round, on every executor. At test
scale nobody notices; on a 1000-executor job running a 50-round
fixpoint over a 100 TB graph, the leak is round-count x frame-size of
MEMORY_AND_DISK storage that the evictor can only reclaim by dropping
blocks a later round may still want.

:func:`unpersist_checkpoint` releases the blocks for real: it reaches
through the analyzed plan to the checkpoint's RDD and unpersists THAT,
falling back to plain ``DataFrame.unpersist()`` for CacheManager-cached
frames (so call sites don't need to care which kind they hold).

Only call it on frames that are truly dead: a localCheckpoint's
lineage is truncated, so once its blocks are gone the frame can NEVER
be recomputed (Spark logs a warning to that effect; we lower that
logger to ERROR only AROUND the unpersist call and restore it after —
the warning's scenario, reuse-after-release, is exactly what the call
sites promise not to do, while unrelated WARNs from the same logger
must keep flowing the rest of the time).

Verified by tests/test_graph.py::test_graph_loops_leave_no_orphaned_blocks
(persistent-RDD census before/after multi-round fixpoints).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame

_RDD_LOGGER = "org.apache.spark.rdd.MapPartitionsRDD"


@contextlib.contextmanager
def _truncation_warning_suppressed(df: DataFrame):
    # RDD.unpersist on a locally-checkpointed RDD logs
    # "lineage has been truncated and cannot be recomputed" once per
    # call; in a 50-round fixpoint that is 50 lines of noise about a
    # scenario (recompute-after-release) the call sites exclude by
    # contract. Lower that one logger to ERROR for the duration of the
    # unpersist ONLY, then restore its previous level — a session-wide
    # lowering would hide unrelated MapPartitionsRDD warnings too
    # (ADVICE r9).
    restore = None
    try:
        jvm = df.sparkSession.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        prev = jvm.org.apache.logging.log4j.LogManager.getLogger(
            _RDD_LOGGER
        ).getLevel()
        configurator.setLevel(
            _RDD_LOGGER, jvm.org.apache.logging.log4j.Level.ERROR
        )
        restore = (configurator, prev)
    except Exception:
        pass  # logging backend not log4j2: keep the warnings, stay correct
    try:
        yield
    finally:
        if restore is not None:
            with contextlib.suppress(Exception):
                restore[0].setLevel(_RDD_LOGGER, restore[1])


def unpersist_checkpoint(df: DataFrame, blocking: bool = False) -> None:
    """Release the storage blocks behind a superseded DataFrame.

    For a ``localCheckpoint``-backed frame this unpersists the
    checkpoint RDD itself (which ``DataFrame.unpersist()`` silently
    fails to reach); for anything else it behaves exactly like
    ``DataFrame.unpersist()``. The frame must never be used again.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            with _truncation_warning_suppressed(df):
                plan.rdd().unpersist(blocking)
            return
    except Exception:
        pass  # Connect / mock frames: fall through to the public API
    df.unpersist(blocking)
