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


def asof_join_sorted(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """As-of backward join without the per-key fan-out: union-tag both
    sides, shuffle ONCE on the key, and resolve matches with a running
    ``last(ignorenulls)`` window inside each key partition.

    Why it scales where ``asof_join_backward`` doesn't: the backward
    variant materializes every (left row × preceding right row) pair
    before the window keeps one — with m matches per key that is an
    O(n·m) intermediate. Here each row exists exactly once in the
    union; the sort inside the key partition lines right rows up
    before the left rows they serve, and the running frame carries the
    latest right payload forward in O(n). One shuffle per side, no
    fan-out, whole-stage codegen throughout (no Python).

    Semantics match ``asof_join_backward`` (greatest ``right_ts`` <=
    ``left_ts`` per key; ties on the timestamp favor the right row —
    inclusive match). The right side must be unique per (key, ts).
    Output columns: all of ``left``'s, then all of ``right``'s;
    overlapping names raise (rename before joining).
    ``how``: 'inner' drops left rows with no preceding right row,
    'left' keeps them with nulls.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"asof_join_sorted: overlapping column names {sorted(overlap)}; "
            "rename one side first"
        )
    # a common orderable timestamp type for the union sort key; only
    # unify dtypes within the timestamp family, where the cast is
    # lossless — a blanket cast of e.g. bigint-epoch vs string yields
    # NULLs that sort first in the union window and produce silently
    # wrong/empty matches, so mismatches outside the family must raise
    lt_type = dict(left.dtypes)[left_ts]
    rt_type = dict(right.dtypes)[right_ts]
    _ts_family = {"timestamp", "timestamp_ntz", "date"}
    if lt_type == rt_type:
        ts_type = lt_type
    elif lt_type in _ts_family and rt_type in _ts_family:
        ts_type = "timestamp"
    else:
        raise TypeError(
            f"asof_join_sorted: incompatible timestamp dtypes "
            f"{left_ts}:{lt_type} vs {right_ts}:{rt_type}; cast both "
            "sides to a common orderable type before joining"
        )

    r_struct = F.struct(*[F.col(c) for c in right.columns])
    r_struct_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_struct_type = left.select(l_struct.alias("s")).schema["s"].dataType

    # side 0 = right, 1 = left: at equal (key, ts) the right row sorts
    # first, so an equal-timestamp right row IS visible to the left row.
    rt = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).cast(ts_type).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_struct_type).alias("__l"),
        r_struct.alias("__r"),
    )
    lt = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).cast(ts_type).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        rt.unionByName(lt)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        filled = filled.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join_sorted: unsupported how={how!r}")
    return filled.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in right.columns],
    )
