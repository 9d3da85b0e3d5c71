"""Count-min sketch as a relational plan.

A CMS is just a d×w counter table — so build it AS a table:
``(i, bucket, cnt)`` with one partial-agg groupBy, instead of merging
opaque binary blobs. Properties that matter:

- **Distributed by construction**: the heavy explode (d rows per
  token) is map-side; the groupBy partial-aggregates before the one
  shuffle; the result is d·w rows (tiny — broadcastable) no matter how
  big the input.
- **Deterministic / engine-reproducible**: bucket = md5_long(token#i)
  mod w, same in DuckDB — the sketch itself is oracle-checkable, not
  just its estimates.
- **Classic CMS guarantees**: estimate(key) = min over d rows ≥ true
  count (only overestimates; error ≤ εN with w = ⌈e/ε⌉ at confidence
  1-(1/2)^d). Pinned in tests.

At 100 TB: w·d stays a few thousand rows; point estimates are a
broadcast join of the sketch against the query keys. The same shape
gives conservative-update variants or per-window sketches (add the
window to the groupBy key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.stable import md5_long


def _bucket(col: Column, i: Column | int, w: int) -> Column:
    istr = F.lit(str(i)) if isinstance(i, int) else i.cast("string")
    return F.pmod(
        md5_long(F.concat(col.cast("string"), F.lit("#"), istr)), F.lit(w)
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch table ``(i, bucket, cnt)`` over the rows' key column
    (pre-explode multi-valued keys upstream).

    ``weight_col`` (r16): build from PRE-AGGREGATED counts — each row
    contributes ``weight_col`` occurrences instead of 1. A CMS cell is
    Σ count(key) over keys hashing into it, so building from a
    (key, count) frame is bit-identical to building from the raw
    stream while exploding d rows per DISTINCT key (vocabulary-sized)
    instead of d rows per occurrence (stream-sized) — guide §2.3
    "aggregate before you shuffle". Consumers that already compute
    exact counts pass them in and drop a full corpus pass."""
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: _bucket(F.col(key_col), i, w),
    )
    if weight_col is None:
        return (
            df.select(F.posexplode(hashes).alias("i", "bucket"))
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return (
        df.select(
            F.col(weight_col).alias("__w"),
            F.posexplode(hashes).alias("i", "bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point estimates for each distinct key in ``keys``: min over the
    d counters. The sketch side is tiny — broadcast it.

    The join is a LEFT join with missing cells coalesced to 0: the
    sketch table only stores non-empty (i, bucket) cells, so a probe
    key hashing into an empty cell has a true counter of 0 — an inner
    join would silently drop that counter from the min (inflating the
    estimate) or drop the key entirely when all d cells are empty
    (a correct CMS reports 0 for never-seen keys).
    """
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: _bucket(F.col(key_col), i, w),
            )
        ).alias("i", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )
