"""Join-strategy control and AQE runtime re-planning.

At cluster scale the difference between sort-merge, shuffled-hash and
broadcast joins is the job cost; these tests pin that (a) hints
actually flip the physical strategy, (b) AQE is on and rewrites plans
at runtime (its skew/coalesce machinery rides on the same flag)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipelinedemo_spark.tables import table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_hints_flip_physical_strategy(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cond = li.l_orderkey == orders.o_orderkey

    merge = li.join(orders.hint("merge"), cond)
    assert "SortMergeJoin" in _plan(merge)

    shash = li.join(orders.hint("shuffle_hash"), cond)
    p = _plan(shash)
    assert "ShuffledHashJoin" in p and "SortMergeJoin" not in p

    bcast = li.join(F.broadcast(orders), cond)
    p = _plan(bcast)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_aqe_enabled_and_replans(spark, sf_dir):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").count()
    agg.collect()  # materialize so AQE finalizes the plan
    p = _plan(agg)
    # the executed plan is adaptive and its shuffle read was finalized
    # at runtime (coalesced partitions on this tiny input)
    assert "AdaptiveSparkPlan isFinalPlan=true" in p
    assert "AQEShuffleRead" in p or "coalesced" in p


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Spark injects a bloom-filter runtime filter on the fact side of
    a shuffle join when the dim side carries a selective predicate —
    at 100 TB this is the difference between scanning the whole fact
    table and skipping most of it before the exchange. Local tables
    sit under the default creation-side thresholds, so the thresholds
    are widened for the assertion; result equality is pinned too."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = table(spark, sf_dir, "lineitem")
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        assert "might_contain" in _plan(j)
        with_filter = j.collect()
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    no_filter = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert sorted(map(tuple, with_filter)) == sorted(map(tuple, no_filter))
