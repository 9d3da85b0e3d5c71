"""Lineage pinning for small multi-consumer frames.

Catalyst has no cross-branch subtree sharing: a frame consumed by k
branches re-derives its full lineage k times (column pruning usually
defeats ReusedExchange too), so corpus-independent frames that feed
several consumers are "pinned" — lineage cut once, partitions reused.

``pin`` is the one sanctioned way to do it, switchable via the
``SPARK_GRAFT_PIN`` env var because the right mechanism differs by
deployment:

- ``local`` (default): ``localCheckpoint(eager=False)`` — partitions
  stored unreplicated on the executors that computed them. Fastest (no
  reliable-storage round-trip) and exactly right for local mode and
  the bench, but per the Spark docs local checkpoints are UNRELIABLE
  under executor loss: a lost executor makes the pinned frame
  unrecomputable (lineage is gone) and fails the job. Acceptable for
  interactive/bench runs; not for long multi-hour cluster jobs.
- ``persist``: ``persist()`` (MEMORY_AND_DISK) — keeps lineage, so a
  lost executor recomputes instead of failing; costs re-derivation
  only on loss. The safe default on a real cluster.
- ``checkpoint``: reliable ``checkpoint(eager=False)`` to
  ``spark.checkpoint.dir`` (caller must have set it) — survives any
  executor loss at the cost of a write to shared storage. For the
  100 TB multi-stage jobs where recomputing the pinned frame is itself
  expensive.

Only pin corpus-INDEPENDENT frames (dictionaries, per-type models,
label frames, centroid tables): pinning a corpus-sized frame trades a
scan for a full materialization and loses at scale.

ONE documented exception (ADVICE r14): a NARROW FIXED-WIDTH
corpus-grain frame — e.g. the 16-byte/row (vec_id, sig) Hamming
signature frame — may be pinned when several branches would otherwise
re-derive it. The arithmetic: at 10⁹ vectors that frame is ~16 GB
CLUSTER-WIDE (kilobytes per partition per executor on a 1000-executor
cluster), smaller than one re-derivation's shuffle, while the corpus
it derives from is ~100 TB. The executor-loss caveat stands: under
the default ``local`` strategy a lost executor makes the pinned frame
unrecomputable mid-job, so long cluster jobs must run such pins with
``SPARK_GRAFT_PIN=persist`` (lineage kept, recompute-on-loss) or
serve the frame from a write-once disk index instead
(``operators.ann_index.hamming_sig_index`` — what the ``_stored``
serving entries do). Each exception site must carry an inline
``# narrow-pin:`` marker naming the row width.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Cut lineage on a small multi-consumer frame; see module docstring.

    Drop-in via ``DataFrame.transform``::

        model = counts.groupBy(...).agg(...).transform(pin)
    """
    strategy = os.environ.get("SPARK_GRAFT_PIN", "local")
    if strategy == "persist":
        return df.persist()
    if strategy == "checkpoint":
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
