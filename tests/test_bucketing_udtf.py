"""Bucketed co-located join eliminates the shuffle; Python UDTF works
as a lateral table function."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelinedemo_spark.sources.bucketed import read_table, write_bucketed
from datapipelinedemo_spark.tables import table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    import shutil

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # a managed table's directory survives the previous session even
    # after the in-memory catalog forgot the table — clear both
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=4,
    )
    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    # force SMJ so the bucket layout (not a broadcast) carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, "o_orderkey").groupBy("o_orderstatus").count()
        plan = _plan(joined)
        n_rows = joined.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    # the join itself must consume bucket layout: no hashpartitioning
    # exchange on o_orderkey (only the final small groupBy shuffles)
    assert "hashpartitioning(o_orderkey" not in plan, plan
    # same result as the plain join
    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .count()
        .count()
    )
    assert n_rows == plain


def test_python_udtf_lateral(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, idx: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    df = spark.createDataFrame(
        [(1, "spark makes queries fast"), (2, "")], "id int, text string"
    )
    df.createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        "SELECT id, word, idx FROM docs_udtf, LATERAL split_words(text)"
    ).collect()
    got = {(r.id, r.idx): r.word for r in out}
    assert got[(1, 0)] == "spark" and got[(1, 3)] == "fast"
    assert all(r.id != 2 for r in out)  # empty text yields nothing
