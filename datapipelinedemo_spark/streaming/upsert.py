"""Streaming keyed upsert via ``foreachBatch``: maintain a
latest-value-per-key table from an update stream.

Structured Streaming's file sinks are append-only; the standard way to
materialize MERGE/upsert semantics (a continuously-maintained keyed
table) is ``foreachBatch``: each micro-batch is handed to a BATCH
function that merges it into the target atomically. This module
implements the canonical parquet-target version:

- the per-batch merge is pure DataFrame code (anti-join the target's
  keys against the batch, union the batch's winners) — no driver-side
  row handling;
- within a batch, the winner per key is the latest by (ts, tiebreak)
  via one ``row_number`` window — deterministic replays;
- publish is genuinely atomic for readers: each merge writes a NEW
  versioned data directory (``<target>__v{N}``) and then repoints a
  symlink at ``target_dir`` with a single ``os.replace`` (rename(2) of
  a symlink is atomic on POSIX) — there is no instant where the table
  path is missing or half-written, and a crash at any step leaves the
  previous version fully readable (orphan version dirs are swept on
  the next merge);
- exactly-once across restarts comes from the checkpoint: foreachBatch
  re-delivers a failed batch with the SAME batch_id, and the merge is
  idempotent for a replayed batch (same winners → same table).

At cluster scale the swap step becomes a table-format commit (Delta /
Iceberg MERGE INTO) — the micro-batch merge plan is identical; only
the atomic-publish mechanism changes. The reference engine has no
streaming upsert at all (SURVEY.md §2.7 gap list).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(
    batch: DataFrame, keys: list[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """Winner row per key: max (ts, tiebreak) — deterministic even for
    equal timestamps (replay-stable)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _recover_legacy_publish(target_dir: str) -> None:
    """Heal the crash window of the old rename-pair publish: a leftover
    ``<target>_old`` with no live target means the first rename landed
    but the second didn't — rename it back so no keys are lost. (New
    publishes are symlink swaps with no such window; this keeps crash
    recovery for tables written by older versions of this module.)"""
    base = target_dir.rstrip("/")
    old = base + "_old"
    if os.path.isdir(old) and not os.path.exists(base):
        os.rename(old, base)
    elif os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)


def merge_batch_into_parquet(
    batch: DataFrame,
    target_dir: str,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
) -> None:
    """One micro-batch merge: keep target rows whose key is absent from
    the batch, add the batch winners, publish atomically.

    Publish protocol: data lives in versioned dirs ``<target>__v{N}``;
    ``target_dir`` itself is a symlink to the current version. Each
    merge writes version N+1, builds a staging symlink, and swaps it in
    with one ``os.replace`` — atomic on POSIX, so a concurrent reader
    resolves either the old or the new version, never neither. Crash
    at any point leaves the current symlink intact; superseded and
    orphaned version dirs are swept at the start of the next merge.
    (On a real cluster this step is a table-format commit — Delta /
    Iceberg MERGE INTO; the merge plan above it is unchanged.)
    """
    spark = batch.sparkSession
    base = target_dir.rstrip("/")
    _recover_legacy_publish(base)
    winners = latest_per_key(batch, keys, ts_col, tiebreak)

    current = os.path.realpath(base) if os.path.isdir(base) else None
    # sweep version dirs not referenced by the live symlink (previous
    # versions already superseded, or half-written orphans of a crash)
    for stale in glob.glob(base + "__v*"):
        if os.path.realpath(stale) != current:
            shutil.rmtree(stale, ignore_errors=True)

    if current is not None:
        target = spark.read.parquet(base)
        merged = target.join(
            winners.select(*keys), keys, "left_anti"
        ).unionByName(winners)
        next_v = int(current.rsplit("__v", 1)[1]) + 1 if "__v" in current else 1
    else:
        merged = winners
        next_v = 1
    new_dir = f"{base}__v{next_v}"
    merged.write.mode("overwrite").parquet(new_dir)

    staging = base + "__lnk"
    if os.path.lexists(staging):
        os.remove(staging)
    os.symlink(os.path.basename(new_dir), staging)
    if os.path.isdir(base) and not os.path.islink(base):
        # legacy real-dir table: rename(2) cannot replace a non-empty
        # directory with a symlink, so move it aside first — readers in
        # this one-time migration window fall back to recovery above
        legacy = base + "_old"
        os.rename(base, legacy)
        os.replace(staging, base)
        shutil.rmtree(legacy, ignore_errors=True)
    else:
        os.replace(staging, base)
    if current is not None and current != os.path.realpath(base):
        # drop the superseded version now (readers mid-scan of it would
        # need a grace period on a shared FS; a table format's snapshot
        # retention replaces this at cluster scale)
        shutil.rmtree(current, ignore_errors=True)


def start_upsert_stream(
    updates: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak: str = "event_id",
):
    """Wire an update stream into the merge: latest value per key wins.

    Returns the StreamingQuery (caller awaits/stops)."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        merge_batch_into_parquet(batch, target_dir, keys, ts_col, tiebreak)

    return (
        updates.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
