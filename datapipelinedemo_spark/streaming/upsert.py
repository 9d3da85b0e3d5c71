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
- the target directory is swapped atomically (write to ``_tmp``,
  rename) so readers never observe a half-written table;
- exactly-once across restarts comes from the checkpoint: foreachBatch
  re-delivers a failed batch with the SAME batch_id, and the merge is
  idempotent for a replayed batch (same winners → same table).

At cluster scale the swap step becomes a table-format commit (Delta /
Iceberg MERGE INTO) — the micro-batch merge plan is identical; only
the atomic-publish mechanism changes. The reference engine has no
streaming upsert at all (SURVEY.md §2.7 gap list).
"""

from __future__ import annotations

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


def merge_batch_into_parquet(
    batch: DataFrame,
    target_dir: str,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
) -> None:
    """One micro-batch merge: keep target rows whose key is absent from
    the batch, add the batch winners, publish atomically."""
    spark = batch.sparkSession
    winners = latest_per_key(batch, keys, ts_col, tiebreak)
    if os.path.isdir(target_dir):
        target = spark.read.parquet(target_dir)
        merged = target.join(
            winners.select(*keys), keys, "left_anti"
        ).unionByName(winners)
    else:
        merged = winners
    tmp = target_dir.rstrip("/") + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    old = target_dir.rstrip("/") + "_old"
    if os.path.isdir(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)


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
