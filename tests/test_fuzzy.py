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


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_blocking_exactness_property(spark, names):
    """Deletion-variant blocking finds EXACTLY the levenshtein<=1
    pairs for arbitrary strings (small alphabet maximizes collisions
    and near-miss structure like transpositions)."""
    df = spark.createDataFrame([(n,) for n in names], ["n"])
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_self_pairs(df, "n", max_dist=1).collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        tuple(sorted((a, b)))
        for a, b in itertools.combinations(names, 2)
        if lev(a, b) <= 1
    }
    assert got == want
