"""Snapshot diff / change-data capture between two keyed table
versions: added, removed, changed rows in one full-outer pass.

The reconciliation primitive behind CDC backfills, replication
audits, and "what changed since yesterday's partition" debugging.
One full-outer join on the key (single co-partitioned shuffle —
both sides hash to the same layout, and bucketed/sorted snapshots
make it exchange-free), then per-row classification with NULL-SAFE
column comparison — a plain ``!=`` silently misses null↔value
transitions, the classic CDC bug.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key as added / removed / changed / unchanged.

    Returns the key columns, ``change_type``, and the old/new values
    of each compared column (``<c>_old`` / ``<c>_new``).
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    same: Column = reduce(
        lambda a, c: a
        & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")),
        compare_cols,
        F.lit(True),
    )
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(
        *keys,
        change.alias("change_type"),
        *[f"{c}_old" for c in compare_cols],
        *[f"{c}_new" for c in compare_cols],
    )
