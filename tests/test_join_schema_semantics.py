"""Join null-semantics and schema-evolution behaviors a data platform
must get right (and document): null-safe equality joins, and reading
across parquet files whose schemas drifted."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_null_safe_join(spark):
    """`eqNullSafe` (<=>) matches null keys to null keys; a plain
    equi-join silently drops every null-keyed row — the classic
    lost-rows bug when joining on a nullable enrichment key."""
    a = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, k string"
    )
    b = spark.createDataFrame(
        [(10, "x"), (20, None)], "rid long, k string"
    )
    plain = a.join(b, a.k == b.k).select("id", "rid").collect()
    assert {(r.id, r.rid) for r in plain} == {(1, 10)}
    safe = a.join(b, a.k.eqNullSafe(b.k)).select("id", "rid").collect()
    assert {(r.id, r.rid) for r in safe} == {(1, 10), (2, 20)}


def test_parquet_schema_merge(spark, tmp_path):
    """Schema drift across partitions: an old shard without the new
    column reads as nulls under mergeSchema — no rewrite, no job
    failure. (At scale, set mergeSchema only on drifted datasets: the
    footer-merge pass costs a file-listing + footer read per shard.)"""
    old = str(tmp_path / "p=1")
    new = str(tmp_path / "p=2")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.parquet(new)
    df = spark.read.option("mergeSchema", True).parquet(str(tmp_path))
    assert set(df.columns) >= {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in df.collect()}
    assert rows[1] is None and rows[2] == "en"


def test_union_by_name_missing_columns(spark):
    """unionByName(allowMissingColumns=True) aligns drifted frames by
    NAME (positional union silently mismatches columns)."""
    a = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    b = spark.createDataFrame(
        [("en", 2)], "lang string, doc_id long"
    )
    u = a.unionByName(b, allowMissingColumns=True)
    got = {(r.doc_id, r.text, r.lang) for r in u.collect()}
    assert got == {(1, "a", None), (2, None, "en")}
