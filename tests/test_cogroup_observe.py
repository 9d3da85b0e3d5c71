"""Cogrouped applyInPandas (two-sided per-key Python merge) and the
df.observe metrics API — the remaining Python-seam / instrumentation
surfaces.

Cogroup is the sanctioned seam when BOTH sides of a per-key merge
need imperative logic at once (sequence alignment, custom as-of
semantics); here it re-implements the backward as-of join and is
equivalence-tested against the declarative operator — the point is
the API contract (per-key aligned pandas frames, Arrow transfer),
not a faster join.

observe() attaches aggregate metrics to an existing action — pipeline
telemetry (row counts, sums for reconciliation) with ZERO extra scans,
where a separate .count()/.agg() job would re-read the source.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from datapipelinedemo_spark.operators.asof import asof_join_backward
from datapipelinedemo_spark.tables import table


def test_cogroup_asof_matches_operator(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    ro = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )

    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("o_orderkey", LongType()),
        ]
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # per-key backward as-of: latest order at or before each event
        if len(left) == 0:
            return pd.DataFrame(columns=["event_id", "o_orderkey"])
        left = left.sort_values("ts")
        right = right.sort_values("o_orderdate")
        if len(right) == 0:
            return pd.DataFrame(
                {"event_id": left.event_id, "o_orderkey": pd.NA}
            ).astype({"o_orderkey": "Int64"})
        m = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="o_orderdate",
            direction="backward",
        )
        return m[["event_id", "o_orderkey"]]

    cg = (
        ev.groupBy("user_id")
        .cogroup(ro.groupBy("o_custkey"))
        .applyInPandas(merge, out_schema)
    )
    got = {
        r.event_id: r.o_orderkey
        for r in cg.collect()
        if r.o_orderkey is not None
    }
    want = {
        r.event_id: r.o_orderkey
        for r in asof_join_backward(
            ev,
            ro.select(
                F.col("o_custkey").alias("k"),
                F.col("o_orderdate").alias("odate"),
                "o_orderkey",
            ),
            left_key="user_id",
            right_key="k",
            left_ts="ts",
            right_ts="odate",
            left_id="event_id",
        ).collect()
    }
    assert got == want


def test_observe_metrics_without_extra_scan(spark, sf_dir):
    from pyspark.sql import Observation

    obs = Observation("orders_metrics")
    orders = table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 1e4 + F.lit(0.5)).cast("long"))
        .alias("price_scaled"),
    )
    # one action drives both the query result AND the metrics
    top = orders.groupBy("o_orderstatus").count().collect()
    assert len(top) == 3
    m = obs.get
    direct = (
        table(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 1e4 + F.lit(0.5)).cast("long")
            ).alias("p"),
        )
        .collect()[0]
    )
    assert m["n_rows"] == direct.n
    assert m["price_scaled"] == direct.p
