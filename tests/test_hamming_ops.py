"""Binary sign-signature Hamming rerank (plans/hamming_ops.py): the
histogram-threshold top-C must equal plain top-C semantics, identical
vectors must be Hamming-0 first-ranked, and deeper rerank must not
lose recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F


def _frame(spark, vectors):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>",
    )


def test_histogram_threshold_equals_plain_topc(spark):
    """The 49-value histogram plan exists for scale; its OUTPUT must be
    exactly the naive per-query window top-C (same (ham, neighbor_id)
    tie-break) — pinned on a random corpus where Hamming ties are
    plentiful."""
    from datapipelinedemo_spark.operators.similarity import (
        hyperplane_signs,
    )
    from datapipelinedemo_spark.plans.hamming_ops import (
        _HAM_PLANES,
        hamming_topc,
    )

    rng = np.random.default_rng(7)
    emb = _frame(spark, rng.standard_normal((180, 64)))
    sigs = emb.select(
        "vec_id",
        hyperplane_signs("embedding", _HAM_PLANES, 64).alias("sig"),
    ).persist()

    got = {
        (r.query_id, r.neighbor_id)
        for r in hamming_topc(sigs, 25).collect()
    }

    q = sigs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig")
    )
    naive = (
        sigs.select(F.col("vec_id").alias("neighbor_id"), "sig")
        .join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))).alias(
                "ham"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    "ham", "neighbor_id"
                )
            ),
        )
        .filter(F.col("rn") <= 25)
    )
    want = {(r.query_id, r.neighbor_id) for r in naive.collect()}
    assert got == want and len(got) == 25 * 4  # 4 queries (ids %50==0)


def test_fast_signs_equal_expression_signs(spark):
    """The broadcast-weights signing path (md5 parity hoisted to a
    Python-computed plan constant) is BIT-IDENTICAL to the original
    per-row md5 expression — same ±1.0 doubles folded in the same
    order — at both the Hamming geometry (48×64) and the LSH one
    (16×64), so every signature-derived oracle stays valid."""
    from datapipelinedemo_spark.operators.similarity import (
        hyperplane_signs,
        with_hyperplane_signs,
    )

    rng = np.random.default_rng(13)
    emb = _frame(spark, rng.standard_normal((80, 64)))
    for planes in (16, 48):
        slow = {
            (r.vec_id, r.sig)
            for r in emb.select(
                "vec_id",
                hyperplane_signs("embedding", planes, 64).alias("sig"),
            ).collect()
        }
        fast = {
            (r.vec_id, r.sig)
            for r in with_hyperplane_signs(emb, "embedding", planes, 64)
            .select("vec_id", "sig")
            .collect()
        }
        assert fast == slow


def test_duplicate_vector_is_hamming_zero_and_top_ranked(spark):
    """vec 100 is an exact copy of query vec 0: its signature matches
    bit-for-bit (deterministic planes), so it leads the candidate list
    and re-ranks at cosine 1.0, rank 1."""
    from datapipelinedemo_spark.operators.similarity import (
        hyperplane_signs,
    )
    from datapipelinedemo_spark.plans.hamming_ops import (
        _HAM_PLANES,
        hamming_topc,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((120, 64))
    vecs[100] = vecs[0]
    emb = _frame(spark, vecs)
    sigs = emb.select(
        "vec_id",
        hyperplane_signs("embedding", _HAM_PLANES, 64).alias("sig"),
    )
    cand = hamming_topc(sigs, 10).collect()
    by_q = {}
    for r in cand:
        by_q.setdefault(r.query_id, []).append(r)
    first = min(
        (r for r in by_q[0]), key=lambda r: (r.ham, r.neighbor_id)
    )
    assert first.neighbor_id == 100 and first.ham == 0

    # and exact rerank of those candidates puts it at rank 1, cosine 1
    qe = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from datapipelinedemo_spark.operators import similarity as SIM

    scored = (
        spark.createDataFrame(
            [(0, r.neighbor_id) for r in by_q[0]],
            "query_id long, neighbor_id long",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("cv"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qe), "query_id")
        .select(
            "neighbor_id",
            (SIM.dot("qv", "cv") / (SIM.norm("qv") * SIM.norm("cv"))).alias(
                "cs"
            ),
        )
        .orderBy(F.desc("cs"), "neighbor_id")
        .collect()
    )
    assert scored[0].neighbor_id == 100
    assert abs(scored[0].cs - 1.0) < 1e-9


def test_stored_signature_serving_equals_inline(spark, sf_dir, tmp_path, monkeypatch):
    """The write-once signature index serves bit-identical results to
    inline signing (same deterministic hyperplanes) — and a second
    call reads the committed index instead of rebuilding."""
    import os

    from datapipelinedemo_spark.plans.hamming_ops import (
        similarity_topk_hamming_rerank,
        similarity_topk_hamming_stored,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    inline = {
        tuple(r)
        for r in similarity_topk_hamming_rerank(spark, sf_dir).collect()
    }
    stored = {
        tuple(r)
        for r in similarity_topk_hamming_stored(spark, sf_dir).collect()
    }
    assert stored == inline and stored
    built = [d for d in os.listdir(tmp_path) if "hamsig" in d]
    assert len(built) == 1  # the index committed under the env root
    # second serve hits the manifest-pinned frame (no rebuild: the
    # committed dir's mtime is untouched)
    before = os.path.getmtime(os.path.join(tmp_path, built[0]))
    stored2 = {
        tuple(r)
        for r in similarity_topk_hamming_stored(spark, sf_dir).collect()
    }
    assert stored2 == inline
    assert os.path.getmtime(os.path.join(tmp_path, built[0])) == before


def test_streaming_hamming_admission_two_microbatches(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A real readStream drive of the admission screen: two
    micro-batches through a foreachBatch whose body IS
    ``hamming_screen_batch`` (the certified batch twin's function)
    against the stored signature index — the union of per-batch
    results equals the twin exactly (the screen is per-vector
    independent, so batching cannot change decisions)."""
    import uuid

    from datapipelinedemo_spark.operators.ann_index import (
        hamming_sig_index,
    )
    from datapipelinedemo_spark.plans.hamming_ops import (
        _HAM_PLANES,
        hamming_screen_batch,
        streaming_hamming_admission,
    )
    from datapipelinedemo_spark.tables import table

    monkeypatch.setenv(
        "SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx")
    )
    twin = streaming_hamming_admission(spark, sf_dir)
    want = {tuple(r) for r in twin.collect()}
    assert want
    # the isotropic synthetic corpus admits everything (min_ham >= 10
    # at sf0.01 — recorded honestly); the REJECT branch is exercised
    # by planting a copy of corpus vector 1 into the stream below
    assert all(r[2] == 1 for r in want)

    src = str(tmp_path / "emb_stream")
    emb = table(spark, sf_dir, "embeddings")
    plant = emb.filter(F.col("vec_id") == 1).select(
        F.lit(1_000_001).cast("long").alias("vec_id"), "embedding"
    )
    (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "embedding")
        .unionByName(plant)
        .repartition(2)
        .write.mode("overwrite")
        .parquet(src)
    )
    want = want | {(1_000_001, 0, 0)}  # exact copy: ham 0, rejected
    corpus = hamming_sig_index(spark, sf_dir, _HAM_PLANES, 64).filter(
        F.col("vec_id") % 10 != 0
    )
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got: set = set()
    n_batches = []

    def _screen(batch_df, batch_id):
        rows = hamming_screen_batch(batch_df, corpus).collect()
        if rows:
            n_batches.append(batch_id)
        got.update(tuple(r) for r in rows)

    q = (
        stream.writeStream.foreachBatch(_screen)
        .queryName(f"hamadm_{uuid.uuid4().hex}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    assert len(n_batches) == 2
    assert got == want


def test_recall_monotone_in_depth_on_catalog_corpus(spark, sf_dir):
    """Deeper rerank can only add candidates, so recall@10 is monotone
    nondecreasing in C (unlike nprobe under a coarse codebook, this
    one IS a superset relation — safe to pin)."""
    from datapipelinedemo_spark.plans.hamming_ops import (
        hamming_recall_by_depth,
    )

    rows = {
        r.rerank_depth: r.recall_at_10
        for r in hamming_recall_by_depth(spark, sf_dir).collect()
    }
    assert set(rows) == {10, 50, 200}
    assert rows[10] <= rows[50] <= rows[200]
    assert rows[200] > 0.5  # depth 200 of 500 must recover the bulk


def test_ndcg_is_one_when_rerank_depth_covers_corpus(spark, tmp_path):
    """With C=50 >= n-1 every vector is a candidate, so the exact
    cosine re-rank reproduces the exact top-10 and mean nDCG@10 is
    exactly 1.0 — the metric's anchor (and the reason it can only
    drop when stage 1 misses or misplaces a true neighbor)."""
    from datapipelinedemo_spark.plans.hamming_ops import (
        hamming_ndcg_at_10,
    )

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((40, 64))
    spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    row = hamming_ndcg_at_10(spark, str(tmp_path)).collect()[0]
    assert row.n_queries == 1  # vec_id 0
    assert row.ndcg_at_10 == 1.0


def test_degenerate_corpus_tie_set_is_window_group_limited(spark):
    """VERDICT r14 #7 — the sign-collapsed corpus: 300 IDENTICAL
    vectors make every signature equal, so ham* = 0 and the
    ``ham <= ham_star`` candidate set is the WHOLE corpus per query.
    Two pins: (a) semantics stay plain top-C (the C smallest
    neighbor_ids), and (b) the plan bounds the tie set with
    WindowGroupLimit (Spark's rank-limit pushdown: a size-C per-group
    heap in one streaming pass — both partial and final stages), so
    no task ever SORTS a corpus-sized tie partition. The bound is
    structural, not data-dependent — it holds at 10⁹ identical
    signatures exactly as it holds here."""
    from datapipelinedemo_spark.operators import similarity as SIM
    from datapipelinedemo_spark.plans.hamming_ops import (
        _HAM_PLANES,
        hamming_topc,
    )
    from tools.explain_audit import plan_string

    n, c = 300, 5
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> cast(1.0 as float))"
        ).alias("embedding"),
    )
    sigs = SIM.with_hyperplane_signs(
        emb, "embedding", _HAM_PLANES, 64
    ).select("vec_id", "sig")
    out = hamming_topc(sigs, c, query_mod=100)

    plan = plan_string(out)
    # partial + final rank-limit stages around the tie-set window
    assert plan.count("WindowGroupLimit") >= 2, plan

    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 100, 200}
    for qid, lst in by_q.items():
        assert len(lst) == c
        assert all(r.ham == 0 for r in lst)
        want = [i for i in range(n) if i != qid][:c]
        assert sorted(r.neighbor_id for r in lst) == want
