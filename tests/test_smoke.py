"""Smoke tests: the driver contract works end-to-end on sf0.001."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "event_type" in df.columns


def test_every_query_runs(spark, sf_dir):
    qs = entrymod.queries()
    assert qs, "catalog is empty"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_oracles_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.tables import table

    ev = table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in entrymod.queries()["approx_distinct_users_per_type"](
            spark, sf_dir
        ).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.1 * n), (k, approx[k], n)
