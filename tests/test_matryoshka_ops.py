"""Matryoshka prefix serving (plans/matryoshka_ops.py): the full-dim
row anchors at recall 1.0, and on a corpus whose signal genuinely
lives in the prefix (the MRL training contract) the truncated search
is lossless."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq


def test_full_dim_anchor_and_bounds(spark, sf_dir):
    from datapipelinedemo_spark.plans.matryoshka_ops import (
        matryoshka_recall_by_dim,
    )

    rows = {
        r.dim: r for r in matryoshka_recall_by_dim(spark, sf_dir).collect()
    }
    assert set(rows) == {4, 16, 64}
    assert rows[64].recall_at_10 == 1.0  # the sanity anchor
    nq = {r.n_queries for r in rows.values()}
    assert len(nq) == 1 and nq.pop() > 0
    for d in (4, 16):
        assert 0.0 <= rows[d].recall_at_10 <= 1.0


def test_prefix_signal_makes_truncation_lossless(spark, tmp_path):
    """Vectors whose last 60 dims are exactly zero: prefix-4 cosine
    equals full cosine, so every truncated top-10 matches the full
    ground truth — recall 1.0 at EVERY d'. The converse check that the
    measurement can distinguish: on signal spread over all dims
    (the sf_dir corpus) d'=4 recall lands strictly below 1.0."""
    from datapipelinedemo_spark.plans.matryoshka_ops import (
        matryoshka_recall_by_dim,
    )

    rng = random.Random(20260815)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(4)] + [0.0] * 60
        for _ in range(60)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(60)),
                "embedding": pa.array(
                    vecs, type=pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 60, type=pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = {
        r.dim: r.recall_at_10
        for r in matryoshka_recall_by_dim(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {4: 1.0, 16: 1.0, 64: 1.0}


def test_planted_mrl_structure_recall_beats_isotropic(spark):
    """The operator's WIN CHANNEL on data with genuine nested-prefix
    structure (VERDICT r13 next-round #6, the OPQ correlated-data
    pattern): two same-size corpora from the same seed — one with
    geometrically decaying per-dim energy (what MRL training
    produces: the prefix carries the information), one isotropic —
    measured by the SAME ``prefix_recall_by_dim`` body the certified
    entry runs. Pins recall@10(d'=16) near-lossless on the structured
    corpus and a wide margin over the isotropic baseline, so the
    serving knob's value is demonstrated, not just its plumbing."""
    import numpy as np

    from datapipelinedemo_spark.plans.matryoshka_ops import (
        prefix_recall_by_dim,
    )

    rng = np.random.default_rng(20260816)
    n, d = 300, 64
    base = rng.standard_normal((n, d))
    decay = 0.72 ** np.arange(d)  # ~0.5% energy left by dim 16

    def frame(vectors):
        return spark.createDataFrame(
            [
                (int(i), [float(x) for x in vectors[i]])
                for i in range(n)
            ],
            "vec_id long, embedding array<float>",
        )

    def recall16(vectors):
        rows = {
            r.dim: r.recall_at_10
            for r in prefix_recall_by_dim(
                frame(vectors), (16, 64), 64
            ).collect()
        }
        assert rows[64] == 1.0  # anchor on both corpora
        return rows[16]

    r_mrl = recall16(base * decay)
    r_iso = recall16(base)
    assert r_mrl >= 0.9, f"structured-corpus recall too low: {r_mrl}"
    assert r_mrl >= r_iso + 0.2, (
        f"no separation: structured {r_mrl} vs isotropic {r_iso}"
    )


def test_structureless_corpus_recall_below_anchor(spark, sf_dir):
    # the honest-baseline property the module banner records: the
    # synthetic corpus has no MRL structure, so aggressive truncation
    # must actually LOSE recall (else the measurement is vacuous)
    from datapipelinedemo_spark.plans.matryoshka_ops import (
        matryoshka_recall_by_dim,
    )

    rows = {
        r.dim: r.recall_at_10
        for r in matryoshka_recall_by_dim(spark, sf_dir).collect()
    }
    assert rows[4] < 1.0
