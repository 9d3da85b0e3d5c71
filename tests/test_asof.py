"""As-of join: the fan-out+window variant and the sorted single-shuffle
variant must agree; the sorted one must also survive long per-key
histories without materializing the (left x matches) blow-up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelinedemo_spark.operators.asof import (
    asof_join_backward,
    asof_join_sorted,
)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, 100),  # matches r@90 (latest <= 100)
            (2, 10, 50),   # matches r@50 (tie — inclusive)
            (3, 10, 5),    # before any right row -> no match
            (4, 20, 100),  # other key
            (5, 30, 100),  # key with no right rows at all
        ],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 50, "a"), (10, 90, "b"), (10, 200, "c"), (20, 10, "d")],
        "rk long, rt long, payload string",
    )
    return left, right


def test_sorted_matches_backward(spark):
    left, right = _frames(spark)
    srt = asof_join_sorted(left, right, "k", "rk", "t", "rt")
    back = asof_join_backward(
        left, right, "k", "rk", "t", "rt", left_id="event_id"
    )
    s = {(r.event_id, r.rt, r.payload) for r in srt.collect()}
    b = {(r.event_id, r.rt, r.payload) for r in back.collect()}
    assert s == b == {(1, 90, "b"), (2, 50, "a"), (4, 10, "d")}


def test_sorted_left_join_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join_sorted(left, right, "k", "rk", "t", "rt", how="left")
    rows = {r.event_id: r.payload for r in out.collect()}
    assert rows == {1: "b", 2: "a", 3: None, 4: "d", 5: None}


def test_sorted_rejects_overlapping_names(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="overlapping"):
        asof_join_sorted(
            left, right.withColumnRenamed("rk", "k"), "k", "k", "t", "rt"
        )


def test_sorted_long_history_no_fanout(spark):
    """Planted pathological history: ONE key with 20k right rows and 1k
    left rows after most of them. The backward variant materializes
    ~1k x 20k = 20M intermediate rows here; the sorted variant's union
    is 21k rows total. Checks the sorted answer exactly."""
    n_r, n_l = 20_000, 1_000
    right = spark.range(n_r).select(
        F.lit(1).alias("rk"),
        (F.col("id") * 2).alias("rt"),  # 0,2,4,...
        F.col("id").alias("ver"),
    )
    left = spark.range(n_l).select(
        (F.col("id") + 90_000).alias("event_id"),
        F.lit(1).alias("k"),
        (F.col("id") * 2 + 2_001).alias("t"),  # odd ts between right rows
    )
    out = asof_join_sorted(left, right, "k", "rk", "t", "rt")
    got = {r.event_id: r.ver for r in out.collect()}
    # t = 2i+2001 -> latest rt <= t is 2*min(i+1000, n_r-1)
    assert len(got) == n_l
    for i in (0, 1, 500, 999):
        expect = min(i + 1000, n_r - 1)
        assert got[90_000 + i] == expect, (i, got[90_000 + i])


def test_sorted_matches_backward_on_testdata(spark, sf_dir):
    """Equality on the real events/orders as-of query shape."""
    from datapipelinedemo_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    ro = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    srt = asof_join_sorted(
        ev, ro, "user_id", "o_custkey", "ts", "o_orderdate"
    ).select("event_id", "o_orderkey")
    back = asof_join_backward(
        ev, ro, "user_id", "o_custkey", "ts", "o_orderdate",
        left_id="event_id",
    ).select("event_id", "o_orderkey")
    s = {(r.event_id, r.o_orderkey) for r in srt.collect()}
    b = {(r.event_id, r.o_orderkey) for r in back.collect()}
    assert s == b and s


def test_sorted_rejects_uncastable_ts_dtypes(spark):
    """bigint-epoch vs string timestamps must raise, not silently cast
    to NULL (NULLs sort first in the union window -> wrong matches)."""
    left, right = _frames(spark)
    right_str = right.withColumn("rt", F.col("rt").cast("string"))
    with pytest.raises(TypeError, match="incompatible timestamp dtypes"):
        asof_join_sorted(left, right_str, "k", "rk", "t", "rt")
