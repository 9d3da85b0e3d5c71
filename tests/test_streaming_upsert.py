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


def test_upsert_publish_is_symlink_swap(spark, tmp_path):
    """After any merge the table path is a symlink to a versioned dir
    and exactly one version dir exists (superseded ones are swept) —
    the publish step is a single atomic rename of the symlink."""
    from datapipelinedemo_spark.streaming.upsert import (
        merge_batch_into_parquet,
    )

    target = str(tmp_path / "t")
    b1 = spark.createDataFrame(_rows((1, 1, 100, 10.0)), SCHEMA)
    merge_batch_into_parquet(b1, target, ["user_id"], "ts", "event_id")
    assert os.path.islink(target)
    b2 = spark.createDataFrame(_rows((2, 2, 101, 20.0)), SCHEMA)
    merge_batch_into_parquet(b2, target, ["user_id"], "ts", "event_id")
    assert os.path.islink(target)
    versions = [p for p in os.listdir(tmp_path) if "__v" in p]
    assert len(versions) == 1  # old version swept on the next merge
    got = {r.user_id: r.value for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 20.0}


def test_upsert_recovers_interrupted_legacy_publish(spark, tmp_path):
    """Crash window of the old rename-pair publish: target missing,
    state stranded in _old. The next merge must restore it and keep
    all prior keys instead of rebuilding from the batch alone."""
    from datapipelinedemo_spark.streaming.upsert import (
        merge_batch_into_parquet,
    )

    target = str(tmp_path / "t")
    spark.createDataFrame(_rows((1, 1, 100, 10.0)), SCHEMA).write.parquet(
        target + "_old"
    )  # simulated: renamed aside, then crashed before the second rename
    batch = spark.createDataFrame(_rows((2, 2, 101, 20.0)), SCHEMA)
    merge_batch_into_parquet(batch, target, ["user_id"], "ts", "event_id")
    got = {r.user_id: r.value for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 20.0}


def test_upsert_migrates_legacy_real_dir(spark, tmp_path):
    """A table written by the old layout (real directory, no symlink)
    is merged into and republished as the symlink layout."""
    from datapipelinedemo_spark.streaming.upsert import (
        merge_batch_into_parquet,
    )

    target = str(tmp_path / "t")
    spark.createDataFrame(_rows((1, 1, 100, 10.0)), SCHEMA).write.parquet(
        target
    )
    batch = spark.createDataFrame(_rows((1, 9, 102, 99.0)), SCHEMA)
    merge_batch_into_parquet(batch, target, ["user_id"], "ts", "event_id")
    assert os.path.islink(target)
    got = {r.user_id: r.value for r in spark.read.parquet(target).collect()}
    assert got == {1: 99.0}


def test_neardup_ingest_stream_two_batches(spark, tmp_path):
    """Streaming twin of incremental_dedup_candidates: batch 1 builds
    the index from scratch (in-batch pair), batch 2 dedups against the
    stored index (vs_corpus pairs) without re-signing batch 1."""
    from datapipelinedemo_spark.streaming.dedup import (
        start_neardup_ingest_stream,
    )

    src = str(tmp_path / "docs_src")
    index_dir = str(tmp_path / "nd_index")
    pairs_dir = str(tmp_path / "nd_pairs")
    ckpt = str(tmp_path / "nd_ckpt")
    os.makedirs(src)

    dup_text = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays the same nine char shingles throughout"
    )
    other = (
        "completely different content about parquet row groups and "
        "shuffle partitions with no overlapping shingle material here"
    )
    doc_schema = "doc_id long, text string"

    # batch 1: docs 1 and 2 are exact near-dups
    spark.createDataFrame(
        [(1, dup_text), (2, dup_text)], doc_schema
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(doc_schema).parquet(src)
    q = start_neardup_ingest_stream(stream, index_dir, pairs_dir, ckpt)
    q.awaitTermination(120)

    got1 = {
        (r.doc_a, r.doc_b, r.pair_type)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert (1, 2, "in_batch") in got1
    assert not any(t == "vs_corpus" for (_, _, t) in got1)

    # batch 2: doc 3 duplicates the corpus text, doc 4 is novel
    spark.createDataFrame(
        [(3, dup_text), (4, other)], doc_schema
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(doc_schema).parquet(src)
    q2 = start_neardup_ingest_stream(stream2, index_dir, pairs_dir, ckpt)
    q2.awaitTermination(120)

    got2 = {
        (r.doc_a, r.doc_b, r.pair_type)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert {(3, 1, "vs_corpus"), (3, 2, "vs_corpus")} <= got2
    assert not any(a == 4 or b == 4 for (a, b, _) in got2)
    # the index now holds all four docs' bands
    idx_docs = {
        r.doc for r in spark.read.parquet(index_dir).select("doc").collect()
    }
    assert idx_docs == {1, 2, 3, 4}


def test_embedding_ingest_stream_screens_against_corpus(spark, tmp_path):
    """ANN twin of the near-dup ingest: batch 2's duplicate vector is
    flagged against the stored index; the orthogonal one is not."""
    from datapipelinedemo_spark.streaming.dedup import (
        start_embedding_ingest_stream,
    )

    src = str(tmp_path / "vec_src")
    index_dir = str(tmp_path / "ann_index")
    pairs_dir = str(tmp_path / "ann_pairs")
    ckpt = str(tmp_path / "ann_ckpt")
    os.makedirs(src)

    base = [1.0] + [0.0] * 63
    ortho = [0.0, 1.0] + [0.0] * 62
    vec_schema = "vec_id long, embedding array<float>"

    spark.createDataFrame([(1, base), (2, ortho)], vec_schema).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(vec_schema).parquet(src)
    q = start_embedding_ingest_stream(stream, index_dir, pairs_dir, ckpt)
    q.awaitTermination(120)
    # first batch has no corpus to screen against -> no pairs output
    assert not os.path.isdir(pairs_dir)

    # batch 2: vec 3 duplicates vec 1; vec 4 is orthogonal to everything
    far = [0.0, 0.0, 1.0] + [0.0] * 61
    spark.createDataFrame([(3, base), (4, far)], vec_schema).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(vec_schema).parquet(src)
    q2 = start_embedding_ingest_stream(stream2, index_dir, pairs_dir, ckpt)
    q2.awaitTermination(120)

    rows = spark.read.parquet(pairs_dir).collect()
    flagged = {(r.id_new, r.id_corpus): (r.cos_sim, r.pair_type) for r in rows}
    assert flagged.get((3, 1), (0, ""))[1] == "vs_corpus"
    assert abs(flagged[(3, 1)][0] - 1.0) < 1e-9
    assert not any(idn == 4 for (idn, _) in flagged)

    # batch 3: two copies of a NEW vector in the same micro-batch must
    # be flagged against each other (in_batch), not both admitted
    novel = [0.0] * 63 + [1.0]
    spark.createDataFrame([(5, novel), (6, novel)], vec_schema).write.mode(
        "append"
    ).parquet(src)
    stream3 = spark.readStream.schema(vec_schema).parquet(src)
    q3 = start_embedding_ingest_stream(stream3, index_dir, pairs_dir, ckpt)
    q3.awaitTermination(120)
    rows = spark.read.parquet(pairs_dir).collect()
    flagged = {(r.id_new, r.id_corpus): r.pair_type for r in rows}
    assert flagged.get((5, 6)) == "in_batch"

    idx_ids = {
        r.neighbor_id
        for r in spark.read.parquet(index_dir).select("neighbor_id").collect()
    }
    assert idx_ids == {1, 2, 3, 4, 5, 6}


def test_read_index_excludes_replaying_batch(spark, tmp_path):
    """Replay safety: a crashed attempt's own partition must not be
    joined against (it would emit self-pairs); real read errors are
    not swallowed; a missing dir means 'first batch'."""
    from datapipelinedemo_spark.streaming.dedup import _read_index

    idx = str(tmp_path / "idx")
    assert _read_index(spark, idx, 0) is None  # not built yet

    spark.createDataFrame(
        [(1, 0, "k1", 0), (2, 0, "k2", 1)],
        "doc long, band int, key string, batch_id long",
    ).write.partitionBy("batch_id").parquet(idx)
    visible = {r.doc for r in _read_index(spark, idx, 1).collect()}
    assert visible == {1}  # batch 1's own rows excluded on replay
    visible = {r.doc for r in _read_index(spark, idx, 7).collect()}
    assert visible == {1, 2}


def test_neardup_ingest_replay_with_stale_index_is_clean(spark, tmp_path):
    """Crash-window replay: rerunning from a fresh checkpoint while a
    prior attempt's index rows are already on disk must produce the
    same pairs as a clean first run — no self-pairs, no vs_corpus
    echoes of the batch's own docs."""
    import shutil

    from datapipelinedemo_spark.streaming.dedup import (
        start_neardup_ingest_stream,
    )

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "pairs")
    os.makedirs(src)
    text = (
        "identical content shared by both documents in this single "
        "batch so an in-batch candidate pair must appear exactly once"
    )
    spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    ).write.mode("append").parquet(src)

    def run(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        q = start_neardup_ingest_stream(stream, index_dir, pairs_dir, ckpt)
        q.awaitTermination(120)
        return sorted(
            (r.doc_a, r.doc_b, r.pair_type)
            for r in spark.read.parquet(pairs_dir).collect()
        )

    first = run(str(tmp_path / "ckpt1"))
    # simulate the crash window: index rows for batch 0 are on disk,
    # but the checkpoint is gone -> the batch replays as batch 0 again
    replay = run(str(tmp_path / "ckpt2"))
    assert replay == first == [(1, 2, "in_batch")]
    shutil.rmtree(str(tmp_path / "ckpt2"))


def test_seeded_index_first_batch_screens_and_appends(spark, tmp_path):
    """ADVICE r6: a batch-built banded index must seed the streaming
    ingest through seed_ingest_index (batch_id=-1 partition) — the
    first streamed batch then screens against the seed, and the mixed
    seed+batch layout stays readable (root-level seed part files would
    hit Spark's conflicting-directory-structures failure)."""
    from datapipelinedemo_spark.operators.dedup import banded_minhash
    from datapipelinedemo_spark.streaming.dedup import (
        seed_ingest_index,
        start_neardup_ingest_stream,
    )

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    dup_text = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays the same nine char shingles throughout"
    )
    other = (
        "completely different content about parquet row groups and "
        "shuffle partitions with no overlapping shingle material here"
    )
    corpus = spark.createDataFrame(
        [(1, dup_text), (2, dup_text)], "doc_id long, text string"
    )
    seed_ingest_index(
        banded_minhash(corpus, "doc_id", "text", 32, 4, 9), index_dir
    )
    assert os.path.isdir(os.path.join(index_dir, "batch_id=-1"))

    # first STREAMED batch: doc 3 duplicates the seeded corpus text
    spark.createDataFrame(
        [(3, dup_text), (4, other)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = start_neardup_ingest_stream(stream, index_dir, pairs_dir, ckpt)
    q.awaitTermination(120)

    got = {
        (r.doc_a, r.doc_b, r.pair_type)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert {(3, 1, "vs_corpus"), (3, 2, "vs_corpus")} <= got
    # mixed seed + streamed layout reads uniformly; seed rows keep -1
    idx = spark.read.parquet(index_dir)
    by_doc = {
        r.doc: r.batch_id
        for r in idx.select("doc", "batch_id").distinct().collect()
    }
    assert by_doc[1] == -1 and by_doc[2] == -1
    assert by_doc[3] == 0 and by_doc[4] == 0


def test_redelivered_doc_emits_no_self_pairs(spark, tmp_path):
    """ADVICE r6: an at-least-once source re-delivering an
    already-indexed doc_id in a LATER batch must not emit a
    (doc, doc, vs_corpus) self-pair."""
    from datapipelinedemo_spark.streaming.dedup import (
        start_neardup_ingest_stream,
    )

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    dup_text = (
        "identical content shared by both documents in this single "
        "batch so an in-batch candidate pair must appear exactly once"
    )
    spark.createDataFrame(
        [(1, dup_text), (2, dup_text)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = start_neardup_ingest_stream(stream, index_dir, pairs_dir, ckpt)
    q.awaitTermination(120)

    # batch 2 re-delivers doc 1 verbatim
    spark.createDataFrame(
        [(1, dup_text)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = start_neardup_ingest_stream(stream2, index_dir, pairs_dir, ckpt)
    q2.awaitTermination(120)

    rows = spark.read.parquet(pairs_dir).collect()
    assert not any(r.doc_a == r.doc_b for r in rows)
    # the legitimate cross-doc pair is still reported for the redelivery
    assert {(r.doc_a, r.doc_b, r.pair_type) for r in rows} >= {
        (1, 2, "in_batch"),
        (1, 2, "vs_corpus"),
    }


def test_compaction_preserves_stream_semantics(spark, tmp_path):
    """Fold the ingest index's batch partitions (streaming/compact.py)
    between runs: the resumed stream must produce EXACTLY the vs-corpus
    pairs an uncompacted control run produces, and the folded rows must
    live under batch_id=-1 with the newest batch partition carried."""
    from datapipelinedemo_spark.streaming.compact import (
        compact_ingest_index,
    )
    from datapipelinedemo_spark.streaming.dedup import (
        start_neardup_ingest_stream,
    )

    dup_a = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays the same nine char shingles throughout"
    )
    dup_b = (
        "a second recurring passage about adaptive query execution and "
        "broadcast hash joins repeated verbatim across ingest batches"
    )
    novel = (
        "completely different content about parquet row groups and "
        "shuffle partitions with no overlapping shingle material here"
    )
    doc_schema = "doc_id long, text string"
    batches = [
        [(1, dup_a), (2, novel)],
        [(3, dup_b)],
        [(4, dup_a)],          # post-maintenance batch: hits batch-0 rows
        [(5, dup_b), (6, dup_a)],
    ]

    def run(tag, compact_after=None):
        src = str(tmp_path / f"src_{tag}")
        index_dir = str(tmp_path / f"idx_{tag}")
        pairs_dir = str(tmp_path / f"pairs_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        os.makedirs(src)
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, doc_schema).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(doc_schema).parquet(src)
            q = start_neardup_ingest_stream(stream, index_dir, pairs_dir, ckpt)
            q.awaitTermination(120)
            if compact_after is not None and i == compact_after:
                audit = compact_ingest_index(
                    spark, index_dir, target_bytes=1 << 30
                )
                assert audit["folded"], audit
        return index_dir, {
            (r.doc_a, r.doc_b, r.pair_type)
            for r in spark.read.parquet(pairs_dir).collect()
        }

    _, control = run("control")
    idx, compacted = run("compacted", compact_after=2)
    assert compacted == control
    assert {(4, 1, "vs_corpus"), (5, 3, "vs_corpus")} <= compacted
    # layout: batches 0..1 folded to the seed partition (batch 2
    # carried as the newest), later partitions appended by the
    # resumed stream
    names = sorted(
        n for n in os.listdir(idx) if n.startswith("batch_id=")
    )
    assert "batch_id=-1" in names
    assert "batch_id=0" not in names
    # folded + appended rows all present
    docs = {
        r.doc for r in spark.read.parquet(idx).select("doc").collect()
    }
    assert docs == {1, 2, 3, 4, 5, 6}


def test_compaction_noop_on_single_partition(spark, tmp_path):
    from datapipelinedemo_spark.streaming.compact import (
        compact_ingest_index,
    )

    idx = tmp_path / "idx"
    (idx / "batch_id=0").mkdir(parents=True)
    spark.createDataFrame([(1, "k")], "doc_id long, key string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(idx / "batch_id=0"))
    audit = compact_ingest_index(spark, str(idx))
    assert audit["folded"] == [] and "skipped" in audit


def test_embedding_batch_pairs_cap_is_invisible_until_it_binds(spark, sf_dir):
    # r9: the hot-bucket cap must change NOTHING at scales where no
    # bucket exceeds it (the oracle-equality contract), and with a
    # tiny cap the output must stay a subset of the uncapped pairs
    # plus keep every bucket's star witness for overflow members.
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.streaming.dedup import (
        embedding_batch_pairs,
    )
    from datapipelinedemo_spark.tables import table

    batch = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 10 < 3
    )

    def pairs(cap):
        _, p = embedding_batch_pairs(batch, None, bucket_cap=cap)
        return {(r.id_new, r.id_corpus) for r in p.collect()}

    uncapped = pairs(None)
    assert pairs(256) == uncapped  # max sf0.01 bucket is 52
    tiny = pairs(2)
    assert tiny <= uncapped
    # star expansion keeps orientation: every emitted pair ascending
    assert all(a < b for a, b in tiny)
