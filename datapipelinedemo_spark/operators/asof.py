"""As-of joins (most-recent-match semantics).

Not present in the reference (SURVEY.md §2.7 gap list); included
because a time-series pipeline at 100 TB needs it constantly (match an
event to the latest dimension snapshot / price / order at or before
its timestamp).

Strategy here: equi-join on the key with a range predicate, then keep
the row with the greatest right-side timestamp per left row via a
window. Catalyst executes the equi-part as a hash join (broadcast when
the right side is small), so the expensive part is only the per-key
fan-out — bounded by matches-per-key, and AQE skew-split handles hot
keys. For a huge right side with long per-key history, prefer
``asof_join_sorted`` (union + repartition + in-partition merge), which
shuffles each side exactly once and never materializes the fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same key.

    ``left_id`` must uniquely identify left rows. The right side must be
    unique per (key, ts) — pre-aggregate it otherwise, or the winner is
    ambiguous (DuckDB's ASOF JOIN has the same requirement).
    """
    r = F.broadcast(right) if broadcast_right else right
    cond = (left[left_key] == r[right_key]) & (r[right_ts] <= left[left_ts])
    joined = left.join(r, cond, how)
    w = Window.partitionBy(left[left_id]).orderBy(F.desc_nulls_last(r[right_ts]))
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )
