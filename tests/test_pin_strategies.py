"""pin.py strategy switch: every SPARK_GRAFT_PIN mode must produce
identical results (the mechanism changes, the frame does not)."""

from __future__ import annotations

import os

import pytest

from datapipelinedemo_spark.plans.catalog import QUERIES, load_catalog

load_catalog()

# pinned multi-consumer plans from three different modules
_PINNED = ["bm25_topk_docs", "bigram_perplexity_scores", "value_mad_outliers"]


@pytest.mark.parametrize("strategy", ["persist", "checkpoint"])
def test_pin_strategy_equivalence(spark, sf_dir, strategy, tmp_path):
    if strategy == "checkpoint":
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    baseline = {}
    for name in _PINNED:
        baseline[name] = sorted(
            map(str, QUERIES[name](spark, sf_dir).collect())
        )
    old = os.environ.get("SPARK_GRAFT_PIN")
    os.environ["SPARK_GRAFT_PIN"] = strategy
    try:
        for name in _PINNED:
            got = sorted(map(str, QUERIES[name](spark, sf_dir).collect()))
            assert got == baseline[name], f"{name} diverged under {strategy}"
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_PIN", None)
        else:
            os.environ["SPARK_GRAFT_PIN"] = old
