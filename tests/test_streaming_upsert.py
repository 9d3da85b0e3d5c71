"""foreachBatch keyed-upsert sink (streaming/upsert.py)."""

from __future__ import annotations

import datetime as dt
import os

from datapipelinedemo_spark.streaming.upsert import (
    latest_per_key,
    start_upsert_stream,
)


def _rows(*tuples):
    return [
        (uid, dt.datetime(2024, 1, 1, 0, 0, s), eid, v)
        for (uid, s, eid, v) in tuples
    ]


SCHEMA = "user_id long, ts timestamp, event_id long, value double"


def test_latest_per_key_tiebreak(spark):
    # same ts for user 1 → higher event_id wins; replay-deterministic
    df = spark.createDataFrame(
        _rows((1, 5, 10, 1.0), (1, 5, 11, 2.0), (2, 3, 12, 3.0)), SCHEMA
    )
    out = {
        r.user_id: (r.event_id, r.value)
        for r in latest_per_key(df, ["user_id"], "ts", "event_id").collect()
    }
    assert out == {1: (11, 2.0), 2: (12, 3.0)}


def test_upsert_stream_latest_value_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: users 1, 2
    spark.createDataFrame(
        _rows((1, 1, 100, 10.0), (2, 2, 101, 20.0)), SCHEMA
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = start_upsert_stream(stream, target, ckpt, keys=["user_id"])
    q.awaitTermination(120)

    got = {
        r.user_id: r.value for r in spark.read.parquet(target).collect()
    }
    assert got == {1: 10.0, 2: 20.0}

    # batch 2: update user 1 (newer ts), insert user 3
    spark.createDataFrame(
        _rows((1, 9, 102, 99.0), (3, 4, 103, 30.0)), SCHEMA
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = start_upsert_stream(stream, target, ckpt, keys=["user_id"])
    q.awaitTermination(120)

    got = {
        r.user_id: r.value for r in spark.read.parquet(target).collect()
    }
    assert got == {1: 99.0, 2: 20.0, 3: 30.0}


def test_upsert_restart_is_idempotent(spark, tmp_path):
    # re-running with the same checkpoint and no new data changes nothing
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    spark.createDataFrame(_rows((1, 1, 100, 10.0)), SCHEMA).write.mode(
        "append"
    ).parquet(src)
    for _ in range(2):
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = start_upsert_stream(stream, target, ckpt, keys=["user_id"])
        q.awaitTermination(120)
    got = {
        r.user_id: r.value for r in spark.read.parquet(target).collect()
    }
    assert got == {1: 10.0}
