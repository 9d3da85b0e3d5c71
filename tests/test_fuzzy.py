"""SymSpell deletion-blocking fuzzy join (operators/fuzzy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipelinedemo_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_self_pairs,
)


def test_deletion_variants(spark):
    out = (
        spark.range(1)
        .select(F.lit("abc").alias("s"))
        .select(deletion_variants("s").alias("v"))
        .collect()[0]
        .v
    )
    assert sorted(out) == ["ab", "abc", "ac", "bc"]


def test_fuzzy_pairs_exact_at_distance_1(spark):
    # planted: substitution, insertion, equal-after-dedup, far pair
    names = [
        ("cat",), ("cut",),        # substitution → pair
        ("cart",),                 # insertion vs cat → pair; lev(cut,cart)=2
        ("dog",),                  # isolated
        ("acb",),                  # transposition of abc-like: lev(cat,acb)=2
    ]
    df = spark.createDataFrame(names, ["n"])
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_self_pairs(df, "n", max_dist=1).collect()
    }
    assert got == {("cat", "cut"), ("cart", "cat")}


def test_fuzzy_blocking_matches_bruteforce(spark, sf_dir):
    # blocking at distance 1 is exact: compare against the O(V²) answer
    from datapipelinedemo_spark.tables import table

    supp = table(spark, sf_dir, "supplier").select("s_name").distinct()
    blocked = {
        (r.name_a, r.name_b)
        for r in fuzzy_self_pairs(
            table(spark, sf_dir, "supplier"), "s_name"
        ).collect()
    }
    a = supp.select(F.col("s_name").alias("x"))
    b = supp.select(F.col("s_name").alias("y"))
    brute = {
        (r.x, r.y)
        for r in a.crossJoin(b)
        .filter((F.col("x") < F.col("y")) & (F.levenshtein("x", "y") <= 1))
        .collect()
    }
    assert blocked == brute
