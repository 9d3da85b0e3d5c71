"""SQ8 quantized serving (plans/sq8_ops.py): near-lossless on the
catalog corpus, and the recall measurement actually detects distortion
when per-dimension resolution is crushed."""

from __future__ import annotations

import numpy as np


def test_sq8_recall_near_lossless_on_catalog_corpus(spark, sf_dir):
    """256 affine levels per dimension barely perturb cosine ranking
    on the spread-out synthetic corpus: recall@10 >= 0.95 (measured
    0.99 at sf0.001 — one boundary neighbor flips — and 1.0 at
    sf0.01; deterministic either way, same integer codes every
    run)."""
    from datapipelinedemo_spark.plans.sq8_ops import int8_recall_at_10

    row = int8_recall_at_10(spark, sf_dir).collect()[0]
    assert row.n_queries > 0
    assert row.recall_at_10 >= 0.95


def test_sq8_recall_detects_crushed_resolution(spark, tmp_path):
    """One outlier coordinate inflates dim 0's range ~1000×, so the
    per-dim affine step becomes coarser than the separation between
    near-tied neighbors that differ ONLY in dim 0 — quantization
    collapses them to one code and the tie-break reorders the top-k.
    The recall table must land strictly below 1.0 (the measurement is
    not vacuous), while the full-precision anchor stays exact."""
    from datapipelinedemo_spark.plans.sq8_ops import int8_recall_at_10

    rng = np.random.default_rng(3)
    n, d = 120, 64
    vecs = rng.standard_normal((n, d))
    # queries are vec_id % 50 == 0 -> 0, 50, 100
    # make candidates that differ from each other only microscopically
    # in dim 0 relative to the outlier-stretched range
    for q in (0, 50, 100):
        base = vecs[q].copy()
        for j, nb in enumerate(range(1, 25)):
            cand = base.copy()
            cand[0] += 1e-4 * (j + 1)  # distinct in float
            cand[1] += 1e-3
            vecs[(q + nb) % n] = cand
    vecs[7, 0] = 1000.0  # the range-crushing outlier
    spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    row = int8_recall_at_10(spark, str(tmp_path)).collect()[0]
    assert row.n_queries == 3
    assert row.recall_at_10 < 1.0
