"""Intra-row ordered pair expansion (reference F16).

The reference builds ``itertools.combinations(All_phrases, 2)`` inside
an RDD map (demo.py:334-361, 453-458), shipping O(k²) Python tuples
through a groupByKey shuffle. Here the pair expansion is a pure array
expression evaluated *inside* the row — no self-join, no shuffle at
all until the downstream aggregate — then a single ``explode``.

At 100 TB this matters twice: (a) the k² blow-up happens in codegen'd
columnar memory rather than as pickled tuples; (b) the only shuffle is
the final partial-agg'd groupBy, and AQE skew-split handles hot
(month, category) groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pair_combinations(arr_name: str) -> Column:
    """All ordered pairs (i < j by array position) of ``arr_name`` as an
    array<struct<item1,item2>> — itertools.combinations orientation.

    The caller is responsible for any per-row dedup (the reference's
    F8 emits a set, so pairs are over distinct phrases).
    """
    return F.expr(
        f"flatten(transform({arr_name}, (x, i) ->"
        f" transform(slice({arr_name}, i + 2, size({arr_name})),"
        f" y -> struct(x AS item1, y AS item2))))"
    )


def explode_pairs(
    df: DataFrame,
    arr_col: str,
    out1: str = "item1",
    out2: str = "item2",
    keep: list[str] | None = None,
) -> DataFrame:
    """Explode a token-array column into one row per ordered pair,
    keeping ``keep`` columns alongside."""
    keep = keep if keep is not None else [c for c in df.columns if c != arr_col]
    pair = F.explode(pair_combinations(arr_col)).alias("__pair")
    return df.select(*keep, pair).select(
        *keep,
        F.col("__pair.item1").alias(out1),
        F.col("__pair.item2").alias(out2),
    )
