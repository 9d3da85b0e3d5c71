"""Salted aggregation/join equivalence on planted skew; stateful
streaming operator (applyInPandasWithState) snapshots."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datapipelinedemo_spark.operators.skew import salted_join, salted_sum_count


def _skewed(spark):
    # one hot key (90%) + tail
    rows = [(0 if i % 10 else i % 7 + 1, float(i % 100)) for i in range(5000)]
    return spark.createDataFrame(rows, "k int, v double")


def test_salted_sum_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r.k: (r.total_v, r.cnt)
        for r in salted_sum_count(df, ["k"], {"v": "total_v"}, buckets=16).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert abs(salted[k][0] - plain[k][0]) < 1e-6


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(8)], "k2 int, name string"
    )
    plain = big.join(small, big.k == small.k2).count()
    salted = salted_join(big, small, "k", "k2", buckets=8).count()
    assert salted == plain


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    from datapipelinedemo_spark.streaming.stateful import running_user_totals
    from datapipelinedemo_spark.tables import table

    src = str(tmp_path / "ev")
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM state_test").collect()
        }
    finally:
        q.stop()
    expected = {
        r.user_id: (r.n, r.t)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(expected)
    for u in expected:
        assert got[u][0] == expected[u][0]
        assert abs(got[u][1] - expected[u][1]) < 1e-6


def test_stateful_catalog_entry_crosses_batches(spark, sf_dir):
    # r9: the certified entry must exercise state ACROSS micro-batches
    # (not just one batch), and its final snapshots must equal the
    # batch aggregate bit-for-bit on the integer grid
    import uuid

    from datapipelinedemo_spark.plans.llm_ops import (
        _stateful_source_dir,
        streaming_stateful_user_totals,
    )
    from datapipelinedemo_spark.streaming.stateful import (
        running_user_totals_exact,
    )
    from datapipelinedemo_spark.tables import table

    got = {
        r.user_id: (r.n_events, r.total_value4)
        for r in streaming_stateful_user_totals(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, r.t4)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 1e4 + F.lit(0.5)).cast("long")
            ).alias("t4"),
        )
        .collect()
    }
    assert got == want

    # multi-batch proof: run the stream again keeping ALL emissions —
    # users updated in both micro-batches emit twice
    src = _stateful_source_dir(spark, sf_dir)
    qname = f"stateful_proof_{uuid.uuid4().hex}"
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        running_user_totals_exact(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        emissions = spark.table(qname).count()
    finally:
        q.stop()
        spark.catalog.dropTempView(qname)
    assert emissions > len(want), (emissions, len(want))


def test_stateful_timeout_evicts_on_rocksdb(spark, tmp_path):
    """VERDICT r9 #9: drive the ProcessingTimeTimeout eviction path on
    the RocksDB state-store provider through a REAL 3-micro-batch
    stream. User 1 appears only in batch 1 (2 events), times out while
    batches 2-3 process other keys (closed snapshot emitted, state
    REMOVED), then reappears in batch 3 and must restart from zero —
    proving the eviction actually dropped the accumulator."""
    import os
    import time
    import uuid

    import pandas as pd

    from datapipelinedemo_spark.streaming.stateful import (
        running_user_totals_evicting,
    )

    src = tmp_path / "ev_evict"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01")
    batches = [
        pd.DataFrame(
            {"user_id": [1, 1, 2], "ts": [t0] * 3, "value": [1.0, 2.0, 5.0]}
        ),
        pd.DataFrame({"user_id": [2], "ts": [t0], "value": [7.0]}),
        pd.DataFrame(
            {"user_id": [2, 1], "ts": [t0] * 2, "value": [9.0, 4.0]}
        ),
    ]
    now = time.time()
    for i, pdf in enumerate(batches):
        f = src / f"b{i}.parquet"
        # micros, not pandas' default nanos: the stream schema says
        # timestamp and this session reads TIMESTAMP(NANOS) as long
        pdf.to_parquet(
            f, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(f, (now - 30 + 10 * i, now - 30 + 10 * i))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    qname = f"evict_{uuid.uuid4().hex}"
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    q = (
        running_user_totals_evicting(stream, timeout_ms=1)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .start()
    )
    def u1_rows(rows):
        return [
            (r.n_events, r.total_value4, r.closed)
            for r in rows
            if r.user_id == 1
        ]

    try:
        # NOT processAllAvailable(): under ProcessingTimeTimeout the
        # engine keeps scheduling "no new data but cleaning up state"
        # batches to fire expired timers, so the query never reports
        # caught-up — poll the sink for the expected emissions instead
        deadline = time.time() + 180
        rows = []
        while time.time() < deadline:
            rows = spark.table(qname).collect()
            got = u1_rows(rows)
            if (2, 30000, True) in got and (1, 40000, False) in got:
                break
            time.sleep(2)
        progress = q.lastProgress
    finally:
        q.stop()
        spark.catalog.dropTempView(qname)
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)

    # the RocksDB provider was actually active (its custom metrics
    # only exist under that provider)
    state_ops = progress["stateOperators"]
    assert state_ops and any(
        k.startswith("rocksdb") for k in state_ops[0]["customMetrics"]
    ), state_ops
    u1 = u1_rows(rows)
    # batch 1 snapshot, the timeout's closed snapshot (same totals),
    # and the restarted-from-zero snapshot after reappearing
    assert (2, 30000, False) in u1, u1
    assert (2, 30000, True) in u1, u1
    assert (1, 40000, False) in u1, u1
    # user 2 never idles long enough relative to its updates to lose
    # running totals at the end: final snapshot covers all 3 events
    u2_final = max(
        (r.n_events, r.total_value4)
        for r in rows
        if r.user_id == 2 and not r.closed
    )
    assert u2_final == (3, 210000), u2_final


@pytest.fixture()
def _private_tmp(tmp_path, monkeypatch):
    """Redirect the stateful-source cache into a fresh tmp dir and
    clear the in-process memo on both sides of the test."""
    import tempfile

    from datapipelinedemo_spark.plans import llm_ops

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    llm_ops._STATEFUL_SRC.clear()
    yield tmp_path
    llm_ops._STATEFUL_SRC.clear()


def test_stateful_source_rejects_symlink_squat(
    spark, sf_dir, _private_tmp
):
    """VERDICT r11 #4: a same-named SYMLINK planted at the predictable
    /tmp path, pointing at a _SUCCESS-bearing dir the current user
    owns, must not redirect the streaming input (os.stat would have
    followed it and passed the ownership check; lstat + the content
    stamp reject it)."""
    import hashlib

    from datapipelinedemo_spark.memo import table_stamp
    from datapipelinedemo_spark.plans import llm_ops
    from datapipelinedemo_spark.tables import table

    key = (sf_dir, table_stamp(sf_dir, "events"))
    tag = hashlib.md5(repr(key).encode()).hexdigest()[:12]
    predicted = _private_tmp / f"spark_graft_stateful_{os.getuid()}_{tag}"
    decoy = _private_tmp / "decoy"
    decoy.mkdir()
    (decoy / "_SUCCESS").touch()  # poisoned input: wrong/empty data
    os.symlink(decoy, predicted)

    src = llm_ops._stateful_source_dir(spark, sf_dir)
    assert os.path.realpath(src) != os.path.realpath(str(decoy))
    assert not os.path.islink(src)
    got = spark.read.parquet(src).count()
    assert got == table(spark, sf_dir, "events").count()


def test_stateful_source_stamped_reuse_and_concurrent_builders(
    spark, sf_dir, _private_tmp
):
    """Concurrent cold builders race benignly (one atomic rename wins,
    the loser adopts the winner's stamped dir or keeps its private
    copy); a later process reuses the published dir without
    rebuilding."""
    from concurrent.futures import ThreadPoolExecutor

    from datapipelinedemo_spark.plans import llm_ops
    from datapipelinedemo_spark.tables import table

    with ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(llm_ops._stateful_source_dir, spark, sf_dir)
            for _ in range(2)
        ]
        res = [f.result() for f in futs]
    want = table(spark, sf_dir, "events").count()
    for r in res:
        assert os.path.exists(os.path.join(r, "_GRAFT_STAMP"))
        assert os.path.exists(os.path.join(r, "_SUCCESS"))
        assert spark.read.parquet(r).count() == want

    # new process simulation: memo cold, published dir present -> the
    # SAME dir comes back with no rebuild (mtime unchanged)
    llm_ops._STATEFUL_SRC.clear()
    published = [r for r in res if ".tmp" not in r and "stage" not in r]
    assert published
    m0 = os.lstat(published[0]).st_mtime_ns
    again = llm_ops._stateful_source_dir(spark, sf_dir)
    assert again == published[0]
    assert os.lstat(again).st_mtime_ns == m0
