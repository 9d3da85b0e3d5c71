"""Partitioned writes + partition pruning: a filter on the partition
column must prune directories at plan time, not scan-and-filter."""

from __future__ import annotations

from datapipelinedemo_spark.sources.sinks import write_parquet
from datapipelinedemo_spark.tables import table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_pruning(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "events_by_type")
    ev = table(spark, sf_dir, "events")
    write_parquet(ev, path, partition_by=["event_type"])

    re_read = spark.read.parquet(path)
    q = re_read.filter(F.col("event_type") == "purchase").select("event_id")
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert "purchase" in plan  # the literal reached the scan
    # pruned read returns exactly the purchase rows
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert q.count() == expected


def test_column_pruning_and_filter_pushdown(spark, sf_dir):
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    # only the two referenced columns in ReadSchema; the filter pushed
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_extendedprice" not in rs[0]
