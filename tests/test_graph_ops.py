"""PageRank over the trade graph (plans/graph_ops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipelinedemo_spark.plans.graph_ops import pagerank_trade_graph


def test_pagerank_mass_and_positivity(spark, sf_dir):
    out = pagerank_trade_graph(spark, sf_dir).persist()
    n = out.count()
    assert n > 0
    # every node has at least the teleport mass; floor-division leaks
    # keep total mass at or slightly below 1
    mn, total = out.agg(
        F.min("pagerank"), F.sum("pagerank")
    ).collect()[0]
    assert mn > 0
    assert 0.9 < total <= 1.000001


def test_pagerank_hub_outranks_leaf(spark, sf_dir):
    # suppliers aggregate many customers' mass: the max-ranked supplier
    # node should outrank the median customer node
    out = pagerank_trade_graph(spark, sf_dir)
    sup_max = (
        out.filter(F.col("node").startswith("s:"))
        .agg(F.max("pagerank"))
        .collect()[0][0]
    )
    cust_max = (
        out.filter(F.col("node").startswith("c:"))
        .agg(F.max("pagerank"))
        .collect()[0][0]
    )
    assert sup_max > cust_max
