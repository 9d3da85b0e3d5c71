"""Stream-stream interval join (streaming/joins.py): the streaming
result must equal the same interval join run as a static batch query,
and late data beyond the watermark must be dropped from state."""

from __future__ import annotations

import datetime as dt
import os

from datapipelinedemo_spark.streaming.joins import clicks_to_purchases

SCHEMA = "user_id long, ts timestamp, event_id long, value double"


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_join_matches_batch_equivalent(spark, tmp_path):
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(cdir)
    os.makedirs(pdir)

    clicks = [
        (1, _t(0), 100, 0.0),
        (1, _t(30), 101, 0.0),
        (2, _t(10), 102, 0.0),
        (3, _t(5), 103, 0.0),
    ]
    purchases = [
        (1, _t(45), 200, 9.99),   # matches clicks 100 (45m) & 101 (15m)
        (2, _t(55), 201, 5.00),   # matches click 102 (45m)
        (3, _t(59, 59), 202, 1.0),  # click 103 at 54m59s -> in window
        (4, _t(20), 203, 7.77),   # no click -> dropped (inner)
    ]
    _write(spark, cdir, clicks)
    _write(spark, pdir, purchases)

    schema = spark.read.parquet(cdir).schema
    cs = spark.readStream.schema(schema).parquet(cdir)
    ps = spark.readStream.schema(schema).parquet(pdir)
    q = (
        clicks_to_purchases(cs, ps, window="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(out).collect()
    }

    # batch twin: identical join condition on static frames
    want = {
        (p[2], c[2])
        for p in purchases
        for c in clicks
        if c[0] == p[0]
        and c[1] <= p[1]
        and (p[1] - c[1]) <= dt.timedelta(hours=1)
    }
    assert got == want
    assert (200, 100) in got and (200, 101) in got  # multi-click fan-out
    assert all(pid != 203 for pid, _ in got)


def test_stream_join_second_batch_still_joins_buffered_clicks(
    spark, tmp_path
):
    """A click arriving in batch 1 must stay in state and join a
    purchase arriving in batch 2 (the whole point of the buffered
    stream-stream join)."""
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(cdir)
    os.makedirs(pdir)

    _write(spark, cdir, [(7, _t(0), 300, 0.0)])
    _write(spark, pdir, [(8, _t(1), 400, 1.0)])  # keeps batch 1 non-empty

    schema = spark.read.parquet(cdir).schema

    def run_once():
        cs = spark.readStream.schema(schema).parquet(cdir)
        ps = spark.readStream.schema(schema).parquet(pdir)
        q = (
            clicks_to_purchases(cs, ps, window="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    assert spark.read.parquet(out).count() == 0

    # batch 2: purchase for user 7 within the window of the buffered click
    _write(spark, pdir, [(7, _t(40), 401, 2.0)])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert {(r.purchase_id, r.click_id) for r in rows} == {(401, 300)}


def test_stream_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """Unmatched clicks must emit a null-purchase row, but only after
    the watermark passes click_ts + window (state eviction proof)."""
    from datapipelinedemo_spark.streaming.joins import (
        clicks_to_purchases_outer,
    )

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(cdir)
    os.makedirs(pdir)

    # user 1 clicks and buys; user 2 clicks and never buys
    _write(spark, cdir, [(1, _t(0), 500, 0.0), (2, _t(0), 501, 0.0)])
    _write(spark, pdir, [(1, _t(10), 600, 3.0)])

    schema = spark.read.parquet(cdir).schema

    def run_once():
        cs = spark.readStream.schema(schema).parquet(cdir)
        ps = spark.readStream.schema(schema).parquet(pdir)
        q = (
            clicks_to_purchases_outer(
                cs, ps, window="1 hour", watermark="30 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = {(r.click_id, r.purchase_id) for r in spark.read.parquet(out).collect()}
    assert (500, 600) in first          # the match emits immediately
    assert (501, None) not in first     # null row NOT yet emitted

    # advance event time far past click_ts + window + watermark on
    # BOTH streams (each side's watermark is the min over inputs)
    _write(spark, cdir, [(9, dt.datetime(2024, 1, 2), 700, 0.0)])
    _write(spark, pdir, [(9, dt.datetime(2024, 1, 2), 701, 1.0)])
    run_once()
    second = {(r.click_id, r.purchase_id) for r in spark.read.parquet(out).collect()}
    assert (501, None) in second        # non-converter surfaced by the join
