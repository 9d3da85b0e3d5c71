"""operators/prefix.py::bucketed_prefix_sum vs the single-partition
window form, on shapes the quantile bucketing must survive: skewed
values, duplicates-in-sum-col, tiny frames, and frames smaller than
the bucket count."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datapipelinedemo_spark.operators.prefix import bucketed_prefix_sum


def _window_form(df, order_col, sum_col):
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return df.withColumn(
        "cum_before",
        F.coalesce(F.sum(sum_col).over(w).cast("long"), F.lit(0)),
    )


def _check(spark, rows, n_buckets=None):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.cum_before
        for r in bucketed_prefix_sum(
            df, "k", "v", n_buckets=n_buckets
        ).collect()
    }
    want = {r.k: r.cum_before for r in _window_form(df, "k", "v").collect()}
    assert got == want


def test_matches_window_form_uniform(spark):
    _check(spark, [(i, i % 7 + 1) for i in range(500)])


def test_matches_window_form_skewed_keys(spark):
    # 90% of keys in one tiny range: most quantile boundaries
    # collapse/dedup, leaving few (possibly empty) buckets
    rows = [(i, 3) for i in range(450)] + [
        (10_000_000 + i, 5) for i in range(50)
    ]
    _check(spark, rows)


def test_single_row_and_fewer_rows_than_buckets(spark):
    _check(spark, [(42, 7)])
    _check(spark, [(1, 1), (5, 2), (9, 3)], n_buckets=64)


def test_zero_and_negative_sums(spark):
    _check(spark, [(i, (-1) ** i * (i % 3)) for i in range(100)])


def test_plan_has_no_single_partition_sort(spark):
    from tools.explain_audit import plan_string, single_partition_sorts

    df = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(500)], "k long, v long"
    )
    plan = plan_string(bucketed_prefix_sum(df, "k", "v"))
    assert single_partition_sorts(plan) == [], plan
    assert single_partition_sorts(plan_string(_window_form(df, "k", "v")))


def test_multi_sum_form_matches_two_single_calls(spark):
    df = spark.createDataFrame(
        [(i, i % 7 + 1, (i * 3) % 11) for i in range(300)],
        "k long, v long, u long",
    )
    both = {
        r.k: (r.cv, r.cu)
        for r in bucketed_prefix_sum(
            df, "k", sums={"v": "cv", "u": "cu"}
        ).collect()
    }
    cv = {
        r.k: r.cv
        for r in bucketed_prefix_sum(df, "k", "v", out_col="cv").collect()
    }
    cu = {
        r.k: r.cu
        for r in bucketed_prefix_sum(df, "k", "u", out_col="cu").collect()
    }
    assert both == {k: (cv[k], cu[k]) for k in cv}


def test_property_random_frames_match_window_form(spark):
    # hypothesis-style without per-example Spark jobs being too slow:
    # a handful of seeded random shapes, incl. heavy duplicates in the
    # sum column and adversarial key gaps
    import random

    rng = random.Random(90210)
    for trial in range(4):
        n = rng.choice([1, 7, 64, 400])
        keys = rng.sample(range(-(10**12), 10**12), n)
        rows = [(k, rng.randint(-5, 50)) for k in keys]
        _check(spark, rows, n_buckets=rng.choice([None, 3, 64]))
