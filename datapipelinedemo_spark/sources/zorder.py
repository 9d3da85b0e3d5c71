"""Z-order (Morton-curve) clustered parquet layout — multi-dimension
data skipping.

``sources/compact.py`` clusters on ONE sort key: range predicates on
that key skip files, but any other column sees every file. Z-ordering
interleaves the bits of TWO keys into one Morton value and
range-partitions on it; each output file then covers a small square
of the (a, b) space, so min/max file stats prune effectively for
predicates on EITHER column (~√F of F files per single-column slice,
instead of F for the unsorted axis of a linear layout). This is the
same layout Delta/Iceberg ``ZORDER BY`` produces; here it is plain
Spark — an expression column + repartitionByRange + write.

The interleave is a pure Catalyst fold (shiftleft/shiftright bit ops),
whole-stage-codegen'd; the only shuffle is the range partitioner's.
Inputs must be pre-normalized to ``[0, 2^bits)`` — callers bucket or
rank real columns first (rank-based normalization also equalizes
skewed dimensions, the standard trick).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_value(a_col: str, b_col: str, bits: int = 16) -> Column:
    """Bit-interleave two non-negative int columns (a gets odd bits, b
    even): one in-row ``aggregate`` fold over bit positions. Takes
    plain column NAMES (F.expr template)."""
    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          cast(0 as bigint),
          (acc, i) -> acc
            + shiftleft(cast(shiftright({a_col}, i) & 1 as bigint), 2*i + 1)
            + shiftleft(cast(shiftright({b_col}, i) & 1 as bigint), 2*i)
        )
        """
    )


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Morton curve of (a_col, b_col)."""
    out = (
        df.withColumn("__z", morton_value(a_col, b_col, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(path)
