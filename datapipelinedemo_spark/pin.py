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

MARKER DISCIPLINE (VERDICT r15 #1 / Next #4 — machine-gated): every
``pin()`` call site must carry one of two inline markers classifying
the pinned frame, on the call line or within the six lines above it:

- ``# pin-bounded: <reason>`` — cardinality does NOT grow with the
  corpus (calendar grids, per-source/per-type scalars, vocabulary
  grain, cohort hit sets). The normal case.
- ``# narrow-pin: <width>`` — corpus-grain but NARROW FIXED-WIDTH
  (the documented exception above). Such frames must contain NO
  array/map/struct/binary columns — ``pin()`` enforces this at
  runtime by reading the caller's marker (the r15
  ``minhash_estimate_error`` defect pinned a frame carrying the
  ``__sh`` shingle ARRAY under no marker at all; width checks on
  fixed-width schemas cannot hide an unbounded column). Short
  bounded-length strings are acceptable when the width note says so.

``tools/pin_audit.py`` walks every call site statically (pytest runs
it), so a missing marker fails CI even on sites no test executes.
"""

from __future__ import annotations

import linecache
import os
import traceback

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Column types whose per-row width is unbounded — forbidden in a
# narrow-pin frame (StructType included: it can nest any of these).
_WIDE_TYPES = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def _caller_marker() -> tuple[str, str] | None:
    """(kind, site) of the nearest marker at the calling site.

    Walks the stack to the first frame outside this module and
    pyspark (``.transform(pin)`` interposes DataFrame.transform),
    then scans that line and the six above it for a marker. Best
    effort — ``tools/pin_audit.py`` is the completeness gate; this
    lookup only powers the runtime narrow-pin width check."""
    here = os.path.abspath(__file__)
    for fr in reversed(traceback.extract_stack()[:-2]):
        fn = fr.filename
        if fn == here or f"{os.sep}pyspark{os.sep}" in fn:
            continue
        for ln in range(fr.lineno, max(fr.lineno - 7, 0), -1):
            line = linecache.getline(fn, ln)
            if ln < fr.lineno and ("pin(" in line or "transform(pin" in line):
                break  # marker region of the nearer call above
            if "narrow-pin:" in line:
                return ("narrow", f"{fn}:{fr.lineno}")
            if "pin-bounded:" in line:
                return ("bounded", f"{fn}:{fr.lineno}")
        return None
    return None


def _narrow_width_check(df: DataFrame) -> None:
    mark = _caller_marker()
    if mark and mark[0] == "narrow":
        wide = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, _WIDE_TYPES)
        ]
        if wide:
            raise ValueError(
                f"narrow-pin at {mark[1]} carries unbounded-width "
                f"column(s) {wide}: a corpus-grain pin is sanctioned "
                "only for narrow fixed-width frames (pin.py policy); "
                "project them out or re-join them from their source "
                "frame per consumer"
            )


def pin(df: DataFrame) -> DataFrame:
    """Cut lineage on a small multi-consumer frame; see module docstring.

    Drop-in via ``DataFrame.transform``::

        model = counts.groupBy(...).agg(...).transform(pin)
    """
    _narrow_width_check(df)
    strategy = os.environ.get("SPARK_GRAFT_PIN", "local")
    if strategy == "persist":
        return df.persist()
    if strategy == "checkpoint":
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def pin_persist(df: DataFrame) -> DataFrame:
    """``pin`` that always uses ``persist()`` (MEMORY_AND_DISK), for the
    rare site where lineage must stay VISIBLE in the plan — e.g. a test
    pins a shared memo frame's InMemoryTableScan in a consumer's
    top-level plan, which a localCheckpoint would truncate out of view.

    Same marker discipline and narrow-width enforcement as ``pin``
    (``tools/pin_audit.py`` walks these sites too). Caveat carried by
    every persist: the frame's logical plan registers in the session
    CacheManager, so LATER builds of an equal lineage get the baked
    InMemoryRelation substituted in — conf-override harnesses must
    clear memo/cache state around overrides (memo.clear_all_memos /
    clearCache), and the entry stays resident until session end unless
    the caller unpersists."""
    _narrow_width_check(df)
    return df.persist()
