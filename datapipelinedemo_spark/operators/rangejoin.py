"""Range (interval-containment) joins at scale.

A naive ``l.key = r.key AND l.ts BETWEEN r.start AND r.end`` runs as a
broadcast-nested-loop or per-key fan-out. The scale pattern: bucket
time into fixed-width cells, explode each right-side interval into the
cells it overlaps, equi-join on (key, cell) — Catalyst gets a plain
hash join — then refine with the precise predicate and dedup. Shuffle
volume grows only by interval_width/cell_width per right row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner join of left points to right intervals on key +
    containment (start <= ts < end), via bucket explosion.

    Output: all left columns + all right columns (one row per
    (point, matching interval) pair).
    """
    b = F.lit(bucket_seconds).cast("long")
    l_b = left.withColumn(
        "__cell", (F.unix_timestamp(F.col(left_ts)).cast("long") / b).cast("long")
    )
    r_b = right.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)).cast("long") / b).cast("long"),
                (F.unix_timestamp(F.col(right_end)).cast("long") / b).cast("long"),
            )
        ),
    )
    joined = l_b.join(
        r_b,
        (l_b[left_key] == r_b[right_key]) & (l_b["__cell"] == r_b["__cell"]),
    )
    refined = joined.filter(
        (F.col(right_start) <= F.col(left_ts))
        & (F.col(left_ts) < F.col(right_end))
    )
    return refined.drop("__cell")
