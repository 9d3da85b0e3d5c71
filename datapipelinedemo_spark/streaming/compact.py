"""Compaction for streaming ingest indexes.

``start_neardup_ingest_stream`` / ``start_embedding_ingest_stream``
append one ``batch_id=N/`` partition per micro-batch forever (VERDICT
r7 next-round #5): after a week of 30-second triggers the index is
~20k tiny partition directories, and every batch's vs-corpus join
pays the file-listing and small-file overhead of all of them.

``compact_ingest_index`` rewrites the historical partitions into the
``batch_id=-1`` seed partition (the one id ``foreachBatch`` can never
produce, so the replay-exclusion filter ``batch_id != current`` keeps
ignoring it) with ~``target_bytes`` output files, then atomically
swaps the new tree in. Run it while the stream is STOPPED (between
``availableNow`` runs, or on a maintenance window).

Crash-safety contract, same shape as ``operators/write_once.py``:

- the rewrite happens in a ``.tmp-`` sibling; the live dir is
  replaced by two renames (live → ``.old-``, tmp → live), so a reader
  or resumed stream sees either the old tree or the new one, never a
  mix;
- the HIGHEST batch partition is carried over untouched by default
  (``keep_latest=True``): if the stream crashed after writing its
  index partition but before the checkpoint committed, that batch
  will replay, and its rows must stay under their own ``batch_id`` so
  the replay exclusion can drop them — folding them into ``-1`` would
  make the replay join the batch against itself;
- the row count is verified (input partitions vs rewritten frame)
  before the swap — a failed verify aborts with the live dir
  untouched;
- a ``_compaction.json`` audit file (underscore-prefixed: invisible
  to Spark's reader) records what was folded.

Cost: one read+write of the folded rows — the same work the batch
pipeline's ``neardup_index`` build pays per corpus generation, amortized
over every later batch's cheaper listing/scan.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_PART_RE = re.compile(r"^batch_id=(-?\d+)$")
SEED_ID = -1


def _partitions(index_dir: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for name in os.listdir(index_dir):
        m = _PART_RE.match(name)
        if m is not None and os.path.isdir(os.path.join(index_dir, name)):
            out[int(m.group(1))] = os.path.join(index_dir, name)
    return out


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_ingest_index(
    spark: SparkSession,
    index_dir: str,
    target_bytes: int = 128 << 20,
    keep_latest: bool = True,
) -> dict:
    """Fold historical ``batch_id`` partitions into the seed
    partition. Returns an audit dict (also written as
    ``_compaction.json`` in the new tree). No-op (and no swap) when
    fewer than two partitions are foldable."""
    parts = _partitions(index_dir)
    ids = sorted(parts)
    carry: list[int] = []
    if keep_latest and ids and max(ids) >= 0:
        carry = [max(ids)]
    fold = [i for i in ids if i not in carry]
    if len(fold) < 2:
        return {"folded": [], "carried": carry, "skipped": "nothing to fold"}

    folded = (
        spark.read.parquet(*[parts[i] for i in fold])
        # reading partition dirs directly drops the batch_id column —
        # exactly what we want; the fold target re-adds it
    )
    in_rows = folded.count()
    nfiles = max(
        1,
        math.ceil(sum(_tree_bytes(parts[i]) for i in fold) / target_bytes),
    )

    tmp = index_dir + f".tmp-{uuid.uuid4().hex[:8]}"
    try:
        (
            folded.coalesce(nfiles)
            .withColumn("batch_id", F.lit(SEED_ID))
            .write.partitionBy("batch_id")
            .parquet(tmp)
        )
        out_rows = spark.read.parquet(tmp).count()
        if out_rows != in_rows:
            raise RuntimeError(
                f"compaction row drift: read {in_rows}, wrote {out_rows}"
            )
        for i in carry:
            os.rename(
                parts[i], os.path.join(tmp, os.path.basename(parts[i]))
            )
        audit = {
            "folded": fold,
            "carried": carry,
            "rows": in_rows,
            "files": nfiles,
        }
        with open(os.path.join(tmp, "_compaction.json"), "w") as fh:
            json.dump(audit, fh, indent=1)
        old = index_dir + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(index_dir, old)
        os.rename(tmp, index_dir)
        shutil.rmtree(old, ignore_errors=True)
        return audit
    finally:
        if os.path.isdir(tmp):
            # failed before the swap: put any carried partition back
            for i in carry:
                moved = os.path.join(tmp, os.path.basename(parts[i]))
                if os.path.isdir(moved) and not os.path.isdir(parts[i]):
                    os.rename(moved, parts[i])
            shutil.rmtree(tmp, ignore_errors=True)
