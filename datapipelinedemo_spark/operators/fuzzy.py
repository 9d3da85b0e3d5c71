"""Fuzzy (edit-distance) self-join via SymSpell deletion-neighborhood
blocking — approximate entity matching without an O(V²) cross join.

Two strings within Levenshtein distance 1 necessarily share at least
one single-character-deletion variant (equal strings share the
original; a substitution pair shares the deletion at the substituted
position; an insert/delete pair shares the shorter string). So:
explode each distinct key into its ≤ len+1 deletion variants, hash
self-join on the variant, then VERIFY the survivors with a real
``levenshtein`` call. The candidate set also contains some distance-2
pairs (e.g. transpositions share an interior deletion) — the verify
filter drops them, so blocking is purely a recall-safe accelerator.

Scale shape: |V| distinct keys become ~|V|·(len+1) variant rows — a
narrow explode — and the quadratic blowup is confined to per-variant
buckets (bucket size = keys sharing one variant, small for natural
keys). The same hot-bucket caveat as MinHash banding applies to
adversarial key sets; cap bucket sizes the same way if needed
(operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col_name: str):
    """Array of the string plus every single-char-deletion of it.

    Takes a plain column NAME (the expression is an F.expr template —
    see the env note about non-reparseable Column SQL).
    """
    c = col_name
    return F.expr(
        f"array_distinct(concat(array({c}),"
        f" transform(sequence(1, length({c})),"
        f" i -> concat(substr({c}, 1, i-1), substr({c}, i+1)))))"
    )


def fuzzy_self_pairs(
    df: DataFrame, col: str, max_dist: int = 1
) -> DataFrame:
    """Distinct unordered pairs of ``col`` values within edit
    distance ``max_dist`` (blocking is exact for ``max_dist=1``; for
    2 it is a recall-lossy heuristic — documented, not default).

    Returns ``(name_a, name_b)`` with ``name_a < name_b``.
    """
    v = df.select(F.col(col).alias("t")).distinct().withColumn(
        "var", F.explode(deletion_variants("t"))
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.var") == F.col("b.var"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .select(
            F.col("a.t").alias("name_a"), F.col("b.t").alias("name_b")
        )
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") <= max_dist)
    )
