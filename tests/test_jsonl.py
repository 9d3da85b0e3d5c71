"""JSONL source/sink: round-trip, corrupt-line quarantine, and
partitioned layout pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipelinedemo_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)
from datapipelinedemo_spark.tables import table


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path)
    clean, dead = split_corrupt(back)
    assert dead.count() == 0
    assert clean.count() == docs.count()
    assert set(clean.columns) == set(docs.columns)
    # values survive byte-identically (spot: per-lang char sums)
    a = {
        (r.lang, r.s)
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    }
    b = {
        (r.lang, r.s)
        for r in clean.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    }
    assert a == b


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "web", "n_chars": 7}\n'
        '{"doc_id": "NOT A NUMBER", "text": "bad type"}\n'
    )
    df = read_jsonl(spark, str(p))
    clean, dead = split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert dead.count() == 2  # the non-JSON line and the type mismatch


def test_jsonl_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_jsonl(docs, path, partition_by=["lang"])
    back = read_jsonl(spark, path)  # lang comes back as a partition col
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the scan: only the lang=en directory read
    assert "PartitionFilters" in plan and "lang" in plan
    expect = docs.filter(F.col("lang") == "en").count()
    assert one.count() == expect
