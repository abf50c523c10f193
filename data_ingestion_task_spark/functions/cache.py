"""Deterministic release of cached / localCheckpoint()ed frames.

``Dataset.unpersist()`` only talks to the SQL cache manager, so it is a
NO-OP for a ``localCheckpoint()``ed DataFrame — the checkpoint blocks
belong to the underlying RDD and are otherwise freed only when the
ContextCleaner notices the RDD object got GC'd (fine eventually, wrong
for long-lived sessions that want bounded storage NOW). The iterative
dedup loops and the ``_cached_deps`` contract route every release
through :func:`release_frame`, which handles both kinds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ReleaseHandle:
    """``_cached_deps`` entry whose ``unpersist()`` really frees the
    wrapped frame. The caching contract (``api.release``, library
    callers) releases deps by calling ``dep.unpersist()`` — a no-op on
    a localCheckpoint()ed DataFrame — so iterative plans wrap their
    loop survivors in this handle instead of handing out the raw
    frame.

    Contract change vs the pre-handle behavior (ADVICE r5 #5): this
    release is REAL, so a result whose checkpointed dep was released
    cannot be recomputed — further actions on it raise. Callers must
    collect before releasing (the documented ``api.release``
    contract); the old no-op unpersist merely made violations
    accidentally survivable."""

    def __init__(self, df: DataFrame):
        self.df = df

    def unpersist(self, blocking: bool = False) -> DataFrame:
        release_frame(self.df)
        return self.df


def release_frame(df: DataFrame) -> None:
    """Free a frame's storage deterministically. Safe on any frame;
    call ONLY when nothing will compute from ``df`` again — releasing
    a localCheckpoint()ed frame drops its truncated lineage's only
    materialization, so later actions on it raise.

    - persisted frames: normal cache-manager unpersist;
    - localCheckpoint()ed frames (analyzed plan is a ``LogicalRDD``):
      additionally unpersist the checkpointed RDD itself, which is
      where the blocks actually live.
    """
    try:
        df.unpersist()
    except Exception:
        pass
    try:
        rel = df._jdf.queryExecution().analyzed()
        if rel.getClass().getSimpleName() == "LogicalRDD":
            rel.rdd().unpersist(False)
    except Exception:
        # best-effort: blocks fall back to ContextCleaner-on-GC
        pass
